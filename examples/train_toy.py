"""End-to-end toy training: a small Transducer learns a synthetic
feature->label mapping, then greedy decoding is evaluated.

Runs on CPU or a single TPU chip:

    python examples/train_toy.py [--steps 300] [--data-parallel]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from warp_rnnt_tpu.models import Transducer, greedy_decode, make_train_step
from warp_rnnt_tpu.parallel import make_mesh, shard_batch


def synthetic_batch(rng, N, T, U, vocab, feat_dim):
    """Labels are recoverable from features: feature frames carry one-hot
    hints of the label sequence."""
    labels = rng.randint(1, vocab, size=(N, U)).astype(np.int32)
    feats = rng.randn(N, T, feat_dim).astype(np.float32) * 0.1
    for i in range(N):
        for u in range(U):
            t = int((u + 0.5) * T / U)
            feats[i, t, labels[i, u] % feat_dim] += 3.0
    xn = np.full((N,), T, np.int32)
    yn = np.full((N,), U, np.int32)
    return jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(xn), jnp.asarray(yn)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--data-parallel", action="store_true")
    args = ap.parse_args()

    vocab, T, U, feat_dim = 16, 24, 4, 16
    rng = np.random.RandomState(0)
    batch = synthetic_batch(rng, args.batch, T, U, vocab, feat_dim)

    model = Transducer(
        vocab_size=vocab, encoder_hidden=64, predictor_hidden=64, joint_hidden=64
    )
    params = model.init(jax.random.PRNGKey(0), batch[0], batch[1])
    opt = optax.adamw(3e-3)
    opt_state = opt.init(params)

    if args.data_parallel:
        mesh = make_mesh()
        batch = shard_batch(mesh, batch)
        print(f"data-parallel over {jax.device_count()} devices")

    step = jax.jit(make_train_step(model, opt))
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, batch)
        if i % 50 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {float(loss):.4f}")

    feats, labels, xn, yn = batch
    tokens, lengths = greedy_decode(model, params, feats, xn, max_length=U + 2)
    correct = sum(
        int(
            lengths[i] == U
            and bool(jnp.all(tokens[i, :U] == labels[i]))
        )
        for i in range(args.batch)
    )
    print(f"greedy decode: {correct}/{args.batch} sequences exactly recovered")

    from warp_rnnt_tpu import rnnt_alignment
    from warp_rnnt_tpu.models import beam_decode

    b_tokens, b_lengths, b_scores = beam_decode(
        model, params, feats, xn, max_length=U + 2, beam_size=4
    )
    b_correct = sum(
        int(b_lengths[i] == U and bool(jnp.all(b_tokens[i, :U] == labels[i])))
        for i in range(args.batch)
    )
    print(f"beam-4 decode: {b_correct}/{args.batch} exactly recovered "
          f"(mean path log-prob {float(jnp.mean(b_scores)):.3f})")

    log_probs = model.apply(params, feats, labels)
    _, frames = rnnt_alignment(log_probs, labels, xn, yn)
    print(f"forced alignment of sample 0: labels {np.asarray(labels[0])} "
          f"emitted at frames {np.asarray(frames[0])}")


if __name__ == "__main__":
    main()
