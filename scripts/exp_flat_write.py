"""Measure the flat (N, T, U*V) gradient writers against each other.

    python scripts/exp_flat_write.py <variant> <N>

variants:
  kernel       Pallas flat writer (ops/flat_kernels.flat_grad_write)
  xla_d4       dense 4D compare-select + reshape (the XLA fallback in
               functional/gather._gather_flat_bwd)
  xla_mask     natively-3D formulation: per-sample (N, UV) one-hot masks
               (built by a tiny scatter) * repeated cotangent columns
  zeros        lower bound: just materialize an (N, T, UV) zeros tensor
               (pure write-bandwidth roofline for this output)

Methodology: the output is passed through `lax.optimization_barrier` before
a 128-lane strided sampling sum — the barrier forces XLA to MATERIALIZE the
full tensor (a plain `.sum()` lets XLA fuse the writer into the reduction
and skip the 8 GB write entirely; that fantasy measured "2838 GB/s" on a
819 GB/s part).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from warp_rnnt_tpu.benchmarks.timing import bench_scalar_chain
from warp_rnnt_tpu.ops import flat_kernels


def materialized_sum(out):
    out = jax.lax.optimization_barrier(out)
    return jnp.sum(out[..., ::128])


def main():
    variant, N = sys.argv[1], int(sys.argv[2])
    T, U, V = 150, 21, 5000
    if len(sys.argv) > 3:
        T, U, V = (int(a) for a in sys.argv[3:6])
    UV = U * V
    rng = np.random.RandomState(0)
    ct0 = jnp.asarray(rng.randn(N, T, U).astype(np.float32))
    ct1 = jnp.asarray(rng.randn(N, T, U).astype(np.float32))
    loc_rows = jnp.asarray(rng.randint(0, V, (N, U)).astype(np.int32))

    if variant == "kernel":
        fn = lambda a, b: flat_kernels.flat_grad_write(
            a, b, loc_rows, 0, V, UV
        )
    elif variant == "xla_d4":
        def fn(a, b):
            v_iota = jnp.arange(V, dtype=jnp.int32).reshape(1, 1, 1, V)
            loc = jnp.broadcast_to(loc_rows[:, None, :], (N, T, U))
            d4 = a[..., None] * (v_iota == 0) + b[..., None] * (
                v_iota == loc[..., None]
            )
            return d4.reshape(N, T, UV)
    elif variant == "xla_mask":
        # (N, UV) hit masks, built once by a tiny scatter (2 nonzeros per
        # (n, u)); the writer is then repeat * mask — no per-element
        # division by V anywhere
        u_off = jnp.arange(U, dtype=jnp.int32) * V
        n_i = jnp.arange(N, dtype=jnp.int32)[:, None]
        bm = jnp.zeros((N, UV), jnp.float32).at[
            n_i, jnp.broadcast_to(u_off[None, :], (N, U))
        ].set(1.0)
        lm = jnp.zeros((N, UV), jnp.float32).at[
            n_i, u_off[None, :] + loc_rows
        ].add(1.0)

        def fn(a, b):
            a_rep = jnp.repeat(a, V, axis=2)          # (N, T, UV)
            b_rep = jnp.repeat(b, V, axis=2)
            return a_rep * bm[:, None, :] + b_rep * lm[:, None, :]
    elif variant == "zeros":
        def fn(a, b):
            z = jnp.zeros((N, T, UV), jnp.float32)
            # depend on the inputs so the chain is data-required
            return z.at[0, 0, 0].set(a[0, 0, 0] + b[0, 0, 0])
    else:
        raise ValueError(variant)

    ms = bench_scalar_chain(fn, (ct0, ct1), iters=10,
                            reduce_out=materialized_sum)
    gb = N * T * UV * 4 / 1e9
    print(f"{variant} N={N}: {ms:.3f} ms  ({gb:.2f} GB out, "
          f"{gb / ms * 1000:.0f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
