"""End-to-end transducer training throughput on TPU.

Times the full train step — encoder + predictor + joint + RNN-T loss +
backward + adamw update — on realistic ASR-ish shapes.  Training loops are
dependency-forced by construction (each step consumes the previous step's
params/opt_state), so the timing methodology concern of `timing.py` does not
arise; params/opt_state buffers are donated, matching a production loop.

Usage: python -m warp_rnnt_tpu.benchmarks.bench_train [N] [T] [U] [V]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import optax

from warp_rnnt_tpu.models import init_model, make_train_step


def bench_train(N=32, T=400, U=40, V=1024, feat_dim=80, hidden=512,
                steps=20, warmup=3, loss_mode="from_logits"):
    model, params, batch = init_model(
        jax.random.PRNGKey(0), vocab_size=V, feat_dim=feat_dim,
        N=N, T=T, U=U,
        encoder_hidden=hidden, predictor_hidden=hidden, joint_hidden=hidden,
    )
    import numpy as np

    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(
        make_train_step(model, opt, loss_mode=loss_mode), donate_argnums=(0, 1)
    )

    state = {"p": params, "o": opt_state, "loss": None}
    for _ in range(warmup):
        state["p"], state["o"], state["loss"] = step(state["p"], state["o"], batch)
    np.asarray(state["loss"])

    # two-point calibration (see timing.py): cancels the constant ~30-60 ms
    # tunnel sync cost out of the per-step time
    def run(k):
        p, o, loss = state["p"], state["o"], state["loss"]
        for _ in range(k):
            p, o, loss = step(p, o, batch)
        state["p"], state["o"], state["loss"] = p, o, loss
        np.asarray(loss)
        return loss

    lo, hi = max(2, steps // 4), max(2, steps // 4) + steps
    t0 = time.perf_counter(); run(lo); t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); run(hi); t_hi = time.perf_counter() - t0
    ms = (t_hi - t_lo) / (hi - lo) * 1000.0
    loss = state["loss"]

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    return {
        "N": N, "T": T, "U": U, "V": V, "hidden": hidden,
        "loss_mode": loss_mode,
        "params_m": round(n_params / 1e6, 2),
        "step_ms": round(ms, 2),
        "utts_per_s": round(N / (ms / 1000.0), 1),
        "loss": round(float(loss), 4),
    }


def main(*args):
    loss_mode = "from_logits"
    if args and args[-1] in ("from_logits", "gather", "fused"):
        loss_mode, args = args[-1], args[:-1]
    cfg = [int(a) for a in args] or [32, 400, 40, 1024]
    print(json.dumps(bench_train(*cfg, loss_mode=loss_mode)), flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
