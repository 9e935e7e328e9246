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
from warp_rnnt_tpu.utils.profiling import compiled_memory_mb, timeit


def make_inputs(key, N, T, U, H, rand_length=False):
    import numpy as np

    k1, k2, k3 = jax.random.split(key, 3)
    f = jax.random.normal(k1, (N, T, H), jnp.float32)
    g = jax.random.normal(k2, (N, U + 1, H), jnp.float32)
    ys = jax.random.randint(k3, (N, U), 1, 2, jnp.int32)
    if rand_length:
        # host-side lengths (compact packing needs static row counts)
        rng = np.random.RandomState(0)
        xn = jnp.asarray(rng.randint(T // 2, T + 1, size=N), jnp.int32)
        yn = jnp.asarray(rng.randint(U // 2, U + 1, size=N), jnp.int32)
    else:
        xn = jnp.full((N,), T, jnp.int32)
        yn = jnp.full((N,), U, jnp.int32)
    return f, g, ys, xn, yn


def bench_joint(N=16, T=150, U=20, V=5000, H=256, mode="from_logits",
                rand_length=False):
    import numpy as np

    key = jax.random.PRNGKey(0)
    f, g, ys, xn, yn = make_inputs(key, N, T, U, H, rand_length)
    joint = Joint(vocab_size=V, hidden=H)
    params = joint.init(jax.random.PRNGKey(1), f, g)

    if mode == "log_softmax+gather":
        def loss_fn(p, f, g):
            lp = joint.apply(p, f, g)  # already log_softmax (N,T,U+1,V)
            return rnnt_loss(lp, ys, xn, yn, reduction="mean", gather=True)
    elif mode == "from_logits":
        # bypass the Joint's final log_softmax: take RAW logits
        # (normalize=False — with the default normalize=True this mode
        # would measure log_softmax PLUS the fused logsumexp, which is
        # exactly the regression round 1 reported)
        def loss_fn(p, f, g):
            logits = joint.apply(p, f, g, normalize=False)
            return rnnt_loss_from_logits(logits, ys, xn, yn, reduction="mean")
    elif mode == "compact":
        # packed joint + packed loss: only the sum(xn_i * (yn_i+1)) valid
        # lattice cells are ever computed — the reference's
        # `requires_packing_` + compact=True comparison
        # (`pytorch_binding/benchmark2.py:120-136`).
        xn_h, yn_h = np.asarray(xn), np.asarray(yn)
        n_idx = np.concatenate([
            np.full(t * (u + 1), i, np.int32)
            for i, (t, u) in enumerate(zip(xn_h, yn_h))
        ])
        t_idx = np.concatenate([
            np.repeat(np.arange(t, dtype=np.int32), u + 1)
            for t, u in zip(xn_h, yn_h)
        ])
        u_idx = np.concatenate([
            np.tile(np.arange(u + 1, dtype=np.int32), t)
            for t, u in zip(xn_h, yn_h)
        ])
        ys_packed = jnp.concatenate([ys[i, : yn_h[i]] for i in range(N)])
        n_idx, t_idx, u_idx = map(jnp.asarray, (n_idx, t_idx, u_idx))

        def loss_fn(p, f, g):
            lp = joint.apply(p, f[n_idx, t_idx], g[n_idx, u_idx])  # (STU, V)
            return rnnt_loss(
                lp, ys_packed, xn, yn, reduction="mean", compact=True,
                max_frames=T, max_labels=U,
            )
    elif mode in ("fused", "auto"):
        # fused: joint+loss Pallas kernel — the (N, T, U+1, V) logits tensor
        # never exists (ops/fused_joint.py), capability the reference
        # architecture cannot express (it requires materialized log-probs,
        # README.md:59).  auto: the routed public surface
        # (functional/joint_loss.rnnt_loss_joint), which picks the measured
        # winner per backend/shape.
        import flax.linen as nn

        from warp_rnnt_tpu import rnnt_loss_joint
        from warp_rnnt_tpu.ops.fused_joint import rnnt_loss_fused_joint

        def loss_fn(p, f, g, mode=mode):
            pp = nn.unbox(p)["params"]
            fused_params = dict(
                w_pre=pp["pre"]["kernel"], b_pre=pp["pre"]["bias"],
                w_out=pp["out"]["kernel"], b_out=pp["out"]["bias"],
            )
            if mode == "auto":
                return rnnt_loss_joint(
                    f, g, fused_params, ys, xn, yn, reduction="mean",
                    layout="auto",
                )
            return rnnt_loss_fused_joint(
                f, g, fused_params, ys, xn, yn, reduction="mean"
            )
    else:
        raise ValueError(mode)

    step = jax.jit(lambda p, f, g: jax.value_and_grad(loss_fn)(p, f, g))
    ms = timeit(step, params, f, g, iters=20)
    # per-program compile-time accounting — runtime peak_bytes_in_use is a
    # process-lifetime high-water mark, so any mode run after the first
    # would report the max over all earlier modes
    mem = compiled_memory_mb(step, params, f, g)
    return {"mode": mode, "N": N, "T": T, "U": U, "V": V, "H": H,
            "rand_length": bool(rand_length),
            "step_ms": round(ms, 3), "peak_hbm_mb": round(mem, 1)}


def main():
    import sys

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mode = args[0] if args else None
    dims = [int(a) for a in args[1:]]  # optional: N T U V [H]
    kw = dict(zip(("N", "T", "U", "V", "H"), dims))
    rand_length = "--rand-length" in sys.argv
    modes = (mode,) if mode else (
        "log_softmax+gather", "from_logits", "compact", "fused",
    )
    for m in modes:
        print(json.dumps(bench_joint(mode=m, rand_length=rand_length, **kw)),
              flush=True)


if __name__ == "__main__":
    main()
