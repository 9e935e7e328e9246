"""Micro-benchmark: lattice-kernel backends head-to-head on TPU.

Times just the alpha/beta sweep (the sequential-DP hot loop) for the column
kernel (`ops/pallas_impl`), the diagonal kernel (`ops/pallas_diag`) and the
pure-XLA scan, plus the jitted dispatch floor of this environment (a trivial
kernel — anything under it is invisible through the remote tunnel).

Usage: python scripts/bench_kernels.py [N T U]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters * 1000.0)
    return best


def main(N=32, T=1500, U=301):
    N, T, U = int(N), int(T), int(U)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    blank = jax.nn.log_sigmoid(jax.random.normal(k1, (N, T, U), jnp.float32))
    emit = jax.nn.log_sigmoid(jax.random.normal(k2, (N, T, U), jnp.float32))
    xn = jnp.full((N,), T, jnp.int32)
    yn = jnp.full((N,), U - 1, jnp.int32)

    floor = timeit(jax.jit(lambda x: x + 1.0), (jnp.zeros((8, 128)),), iters=100)
    print(f"dispatch floor (trivial jit): {floor:.3f} ms")

    hbm_gb = 4 * N * T * U * 4 / 1e9  # 2 in + 2 out fp32
    print(f"lattice (N={N}, T={T}, U={U}): {hbm_gb:.2f} GB in+out "
          f"-> bw floor ~{hbm_gb / 0.8 * 1000 / 1000:.2f} ms @ 800 GB/s")

    from warp_rnnt_tpu.ops import pallas_diag, pallas_impl

    for name, mod in [("column", pallas_impl), ("diag", pallas_diag)]:
        fb = jax.jit(lambda b, e, m=mod: m.alpha_beta(b, e, xn, yn, True))
        bo = jax.jit(lambda b, e, m=mod: m.alpha_beta(b, e, xn, yn, False)[1])
        ms_fb = timeit(fb, (blank, emit))
        ms_bo = timeit(bo, (blank, emit))
        print(f"{name:8s} alpha+beta: {ms_fb:7.3f} ms   beta-only: {ms_bo:7.3f} ms")

    from warp_rnnt_tpu.functional import scan_impl

    fb = jax.jit(
        lambda b, e: (
            scan_impl.compute_alphas(b, e, xn, yn),
            scan_impl.compute_betas(b, e, xn, yn),
        )
    )
    print(f"{'xla-scan':8s} alpha+beta: {timeit(fb, (blank, emit)):7.3f} ms")


if __name__ == "__main__":
    main(*sys.argv[1:])
