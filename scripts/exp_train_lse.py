"""Experiment: kill the train step's logsumexp relayout copies.

The train-step profile shows ~15 ms/step of pure relayout copies
(bf16[32,400,40,1024] {3,2,1,0} <-> {1,0,2,3}) bracketing the from-logits
logsumexp: XLA lays out the joint matmul's output V-minor but prefers a
different layout for the VPU reduction over V, and pays full-tensor copies
both ways (plus the mirrored copy in the backward reading the residual).

Variant "einsum": compute the exp-sum as a dot with a ones-vector — the
contraction over the minor dim runs on the MXU and consumes the matmul's
native layout, so no relayout should be inserted.  The max shift stays a
VPU reduce (cheap if it doesn't force a relayout on its own).

Usage: python scripts/exp_train_lse.py <base|einsum>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from warp_rnnt_tpu.functional import from_logits as FL
from warp_rnnt_tpu.functional import gather as G


def gather2_einsum(logits, loc, blank):
    V = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1))
    s = jnp.einsum(
        "...v,v->...", jnp.exp(logits - m[..., None]),
        jnp.ones((V,), jnp.float32),
    )
    logZ = m + jnp.log(s)
    if G._use_mask(V, logits.dtype):
        v_iota = jnp.arange(V, dtype=jnp.int32).reshape((1,) * loc.ndim + (V,))
        emit = jnp.sum(jnp.where(v_iota == loc[..., None], logits, 0.0), axis=-1)
    else:
        emit = jnp.take_along_axis(logits, loc[..., None], axis=-1)[..., 0]
    return logits[..., blank] - logZ, emit - logZ, logZ


def main():
    variant = sys.argv[1]
    if variant == "einsum":
        FL._gather2 = gather2_einsum

    from warp_rnnt_tpu.benchmarks.bench_train import bench_train

    out = bench_train(32, 400, 40, 1024, loss_mode="from_logits")
    print(variant, out, flush=True)


if __name__ == "__main__":
    main()

# MEASURED RESULT (v5e): base 46.31 ms/step, einsum 46.27 ms/step — no
# change.  The relayout copies are NOT the logsumexp formulation's fault:
# the forward reductions over V prefer a V-major layout while the backward
# d_logits matmul needs V-minor, so XLA materializes the bf16 logits tensor
# in both layouts regardless of how the reduction is written.  Removing the
# conflict would require recomputing logits in the backward instead of
# storing them (a joint+loss-fused custom_vjp), traded against one extra
# out-projection matmul.
