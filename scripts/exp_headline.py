"""Experiment: headline-config (N=32, T=150, U=20, V=5000) pipeline A/B.

Profiling shows loss+grad = 2.84 ms backward compare-select write (81% of
the write roofline) + 1.43 ms forward gather (sparse reads SHOULD be near
free) + ~0.2 ms DP.  Variants swap the gather fwd/bwd formulations inside
the real `run_loss_bench` pipeline:

  base       current: 4D take_along_axis fwd, 4D iota-select bwd
  flat_fwd   flat-3D (N,T,U*V) fwd (force _FLAT3D_BYTES=0), 4D bwd
  flat_bwd   4D fwd, flat-3D bwd (lane%V compare, reshape to 4D)
  flat_both  both

Run ONE variant per process:  python scripts/exp_headline.py <variant> [N]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from warp_rnnt_tpu.functional import gather


def flat_bwd(blank, res, ct):
    loc, V, dtype_tag = res
    N, T, U = loc.shape
    lane_v = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, U * V), 2)
        % V
    )
    ct = ct.astype(jnp.float32)
    ctb = jnp.repeat(ct[..., 0], V, axis=-1)  # (N, T, U*V)
    ctl = jnp.repeat(ct[..., 1], V, axis=-1)
    loc3 = jnp.repeat(loc.astype(jnp.int32), V, axis=-1)
    d3 = jnp.where(lane_v == blank, ctb, 0.0) + jnp.where(
        lane_v == loc3, ctl, 0.0
    )
    return d3.reshape(N, T, U, V).astype(dtype_tag.dtype), None


def main():
    variant = sys.argv[1]
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    if variant in ("flat_fwd", "flat_both"):
        gather._FLAT3D_BYTES = 0
    if variant in ("flat_bwd", "flat_both"):
        gather.gather_blank_label.defvjp(gather._gather_fwd, flat_bwd)

    from warp_rnnt_tpu.benchmarks.bench_loss import run_loss_bench

    ms = run_loss_bench(N, 150, 20, 5000, 30, grad=True)
    print(f"{variant} N={N}: loss+grad {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
