"""Profile the full train step on TPU and print the per-op breakdown.

bench_train measures ~54 ms/step at N=32, T=400, U=40, V=1024, H=512 while
a back-of-envelope roofline (joint+loss elementwise traffic ~11 GB + out-
projection matmuls ~1.7 TFLOP) suggests ~22 ms — this shows where the rest
goes (GRU scan latency? conv encoder? optimizer?).

Usage: python scripts/profile_train.py [gather|from_logits]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import optax

from warp_rnnt_tpu.models import init_model, make_train_step
from warp_rnnt_tpu.utils.profiling import op_breakdown, trace


def main(loss_mode="from_logits"):
    N, T, U, V, hidden = 32, 400, 40, 1024, 512
    model, params, batch = init_model(
        jax.random.PRNGKey(0), vocab_size=V, feat_dim=80, N=N, T=T, U=U,
        encoder_hidden=hidden, predictor_hidden=hidden, joint_hidden=hidden,
    )
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(model, opt, loss_mode=loss_mode))

    p, o, loss = step(params, opt_state, batch)
    jax.block_until_ready(loss)

    ITERS = 5
    tdir = "/tmp/train_trace"
    with trace(tdir):
        for _ in range(ITERS):
            p, o, loss = step(p, o, batch)
        jax.block_until_ready(loss)

    for us, name in op_breakdown(tdir, top=35):
        print(f"{us / ITERS:10.1f} us/iter  {name[:110]}")


if __name__ == "__main__":
    main(*sys.argv[1:])
