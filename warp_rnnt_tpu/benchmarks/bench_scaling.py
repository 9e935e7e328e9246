"""Data-parallel scaling benchmark: lattices/s vs device count.

On a pod slice this measures real ICI scaling — the loss is embarrassingly
parallel over the batch (per-sample lattices never communicate; the only
collective is the final scalar pmean), so efficiency should be near-perfect.
Target (BASELINE.md): >= 90% scaling efficiency from 1 device to N.

On a single host with K VIRTUAL CPU devices (JAX_PLATFORMS=cpu +
--xla_force_host_platform_device_count=K) this validates that the sharded
program compiles and matches the single-device loss, but the efficiency
column is meaningless there: all K "devices" share one CPU's cores, so
throughput cannot scale.  Real multi-chip numbers require a pod slice.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from warp_rnnt_tpu.parallel import rnnt_loss_shard_map
from warp_rnnt_tpu.utils.profiling import timeit


def lattices_per_second(num_devices: int, per_device_batch=8, T=150, U=20, V=2, iters=20):
    """Throughput of the sharded loss (pre-gathered lattice, loss+grad)."""
    devices = jax.devices()[:num_devices]
    mesh = Mesh(np.asarray(devices).reshape(num_devices), ("data",))
    N = per_device_batch * num_devices
    key = jax.random.PRNGKey(0)
    xs = jax.random.normal(key, (N, T, U + 1, 2), jnp.float32) - 5.0
    ys = jax.random.randint(key, (N, U), 1, 28, jnp.int32)
    xn = jnp.full((N,), T, jnp.int32)
    yn = jnp.full((N,), U, jnp.int32)

    @jax.jit
    def step(xs):
        return jax.value_and_grad(
            lambda z: rnnt_loss_shard_map(
                mesh, z, ys, xn, yn, reduction="mean", blank=-1
            )
        )(xs)

    ms = timeit(step, xs, iters=iters)
    return N / (ms / 1000.0)


def main():
    n_dev = jax.device_count()
    base = lattices_per_second(1)
    rows = [{"devices": 1, "lattices_per_s": round(base, 1), "efficiency": 1.0}]
    d = 2
    while d <= n_dev:
        lps = lattices_per_second(d)
        rows.append(
            {
                "devices": d,
                "lattices_per_s": round(lps, 1),
                "efficiency": round(lps / (base * d), 3),
            }
        )
        d *= 2
    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
