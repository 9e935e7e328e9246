"""Experiment: gather formulation and logsumexp layout in the mid-V regime.

The train-step profile at V=1024 (N=32, T=400, U=41) shows:
  * take_along_axis emit gather: 8.7 ms for a 2 MB output — the slow
    small-V gather regime extends far above the _SMALL_V=256 threshold;
  * two ~2.15 GB relayout copies around the 4D logsumexp (XLA picks a
    V-major layout for the reduce and pays full-tensor copies both ways).

Variants (one per process):
  taa <V>      take_along_axis gather, (N,T,U,V) fp32
  mask <V>     compare-mask reduction gather
  lse4d        logsumexp over axis -1 of the 4D tensor (bf16 storage)
  lse2d        same but reshaped to (N*T*U, V) first

Usage: python scripts/exp_midv.py <variant> [V]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from warp_rnnt_tpu.benchmarks.timing import bench_scalar_chain

N, T, U = 32, 400, 41


def main():
    variant = sys.argv[1]
    V = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    xs = jax.jit(lambda k: jax.random.normal(k, (N, T, U, V), jnp.float32))(k1)
    loc = jnp.broadcast_to(
        jax.random.randint(k2, (N, 1, U), 0, V, jnp.int32), (N, T, U)
    )

    if variant == "taa":
        fn = lambda x: jnp.take_along_axis(x, loc[..., None], axis=-1)[..., 0]
    elif variant == "mask":
        v_iota = jnp.arange(V, dtype=jnp.int32).reshape(1, 1, 1, V)
        fn = lambda x: jnp.sum(
            jnp.where(v_iota == loc[..., None], x, 0.0), axis=-1
        )
    elif variant == "lse4d":
        fn = lambda x: jax.nn.logsumexp(x, axis=-1)
    elif variant == "lse2d":
        fn = lambda x: jax.nn.logsumexp(
            x.reshape(-1, x.shape[-1]), axis=-1
        ).reshape(x.shape[:-1])
    else:
        raise SystemExit(f"unknown variant {variant}")

    ms = bench_scalar_chain(fn, (xs,), iters=30, reduce_out=jnp.sum)
    gb = xs.nbytes / (1 << 30)
    print(f"{variant} V={V} ({gb:.2f} GB): {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
