"""Measure the Pallas flat grad writer vs the XLA reshape composition.

    python scripts/exp_flat_write.py <kernel|xla> <N>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from warp_rnnt_tpu.benchmarks.timing import bench_scalar_chain
from warp_rnnt_tpu.ops import flat_kernels


def main():
    variant, N = sys.argv[1], int(sys.argv[2])
    T, U, V = 150, 21, 5000
    rng = np.random.RandomState(0)
    ct0 = jnp.asarray(rng.randn(N, T, U).astype(np.float32))
    ct1 = jnp.asarray(rng.randn(N, T, U).astype(np.float32))
    loc_rows = jnp.asarray(rng.randint(0, V, (N, U)).astype(np.int32))

    if variant == "kernel":
        fn = lambda a, b: flat_kernels.flat_grad_write(
            a, b, loc_rows, 0, V, U * V
        )
    else:
        def fn(a, b):
            v_iota = jnp.arange(V, dtype=jnp.int32).reshape(1, 1, 1, V)
            loc = jnp.broadcast_to(loc_rows[:, None, :], (N, T, U))
            d4 = a[..., None] * (v_iota == 0) + b[..., None] * (
                v_iota == loc[..., None]
            )
            return d4.reshape(N, T, U * V)

    ms = bench_scalar_chain(fn, (ct0, ct1), iters=20, reduce_out=jnp.sum)
    gb = N * T * U * V * 4 / 1e9
    print(f"{variant} N={N}: {ms:.3f} ms  ({gb:.2f} GB out, "
          f"{gb / ms * 1000:.0f} GB/s)")


if __name__ == "__main__":
    main()
