"""Micro-benchmark: lattice-kernel backends head-to-head on TPU.

Times just the alpha/beta sweep (the sequential-DP hot loop) for the column
kernel (`ops/pallas_impl`) and the pure-XLA scan.  Uses the dependency-forced scalar-chain methodology from
`warp_rnnt_tpu.benchmarks.timing` — naive block_until_ready loops measure
fantasy numbers in this environment.

Usage: python scripts/bench_kernels.py [N T U]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from warp_rnnt_tpu.benchmarks.timing import bench_scalar_chain


def main(N=32, T=1500, U=301):
    N, T, U = int(N), int(T), int(U)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    blank = jax.nn.log_sigmoid(jax.random.normal(k1, (N, T, U), jnp.float32))
    emit = jax.nn.log_sigmoid(jax.random.normal(k2, (N, T, U), jnp.float32))
    xn = jnp.full((N,), T, jnp.int32)
    yn = jnp.full((N,), U - 1, jnp.int32)

    hbm_gb = 4 * N * T * U * 4 / 1e9  # 2 in + 2 out fp32
    print(f"lattice (N={N}, T={T}, U={U}): {hbm_gb:.2f} GB in+out")

    # pallas_call outputs are opaque to XLA, so a cheap touch of each output
    # forces the whole kernel; the corner elements depend on the full DP
    # anyway (beta[0,0] is the loss).
    def touch(out):
        a, b = out
        s = b[:, 0, 0].sum()
        if a is not None:
            s = s + a[:, -1, -1].sum()
        return s

    from warp_rnnt_tpu.ops import pallas_impl

    ms_fb = bench_scalar_chain(
        lambda b, e: pallas_impl.alpha_beta(b, e, xn, yn, True),
        (blank, emit), iters=20, reduce_out=touch)
    ms_bo = bench_scalar_chain(
        lambda b, e: pallas_impl.alpha_beta(b, e, xn, yn, False),
        (blank, emit), iters=20, reduce_out=touch)
    print(f"column   alpha+beta: {ms_fb:7.3f} ms   beta-only: {ms_bo:7.3f} ms")

    # pure-XLA scan: reduce over FULL outputs (partial reductions would let
    # XLA skip lattice work)
    from warp_rnnt_tpu.functional import scan_impl

    ms = bench_scalar_chain(
        lambda b, e: (
            scan_impl.compute_alphas(b, e, xn, yn),
            scan_impl.compute_betas(b, e, xn, yn),
        ),
        (blank, emit), iters=20,
        reduce_out=lambda out: out[0].sum() + out[1].sum())
    print(f"{'xla-scan':8s} alpha+beta: {ms:7.3f} ms")


if __name__ == "__main__":
    main(*sys.argv[1:])
