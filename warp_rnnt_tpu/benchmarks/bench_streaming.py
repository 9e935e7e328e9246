"""Streaming-session latency on TPU.

Serving-side counterpart of `bench_decode`: measures the per-chunk latency
of a jitted `stream_step` (stateful chunked encode + incremental greedy
decode, `models/streaming.py`) — the number an online ASR deployment cares
about (it bounds user-visible lag together with the encoder's 4-frame
algorithmic lookahead).  The reference project has no serving tier.

Usage: python -m warp_rnnt_tpu.benchmarks.bench_streaming [N] [C] [V]
"""

from __future__ import annotations

import json
import sys
from functools import partial

import jax
import jax.numpy as jnp

from warp_rnnt_tpu.models import init_model, stream_init, stream_step


def bench_streaming(N=8, C=16, V=1024, beam=0, feat_dim=80, hidden=512,
                    max_length=100):
    model, params, _ = init_model(
        jax.random.PRNGKey(0), vocab_size=V, feat_dim=feat_dim,
        N=N, T=C, U=8,
        encoder_hidden=hidden, predictor_hidden=hidden, joint_hidden=hidden,
    )
    chunk = jax.random.normal(jax.random.PRNGKey(1), (N, C, feat_dim))
    state0 = stream_init(model, params, N, max_length=max_length,
                         beam_size=beam)

    # the chunk chain: feed the SAME chunk repeatedly; every iteration is
    # data-required through the session state (the tokens buffer saturates
    # at max_length, after which steps are pure frame consumption — the
    # steady-state serving regime)
    dec_key = "dec_beam" if beam else "dec"
    step = jax.jit(
        lambda s: (s[dec_key][1], stream_step(model, params, s, chunk))
    )

    from warp_rnnt_tpu.benchmarks.timing import bench_grad_chain

    ms = bench_grad_chain(step, state0, iters=30)
    return {
        "N": N, "chunk_frames": C, "V": V, "hidden": hidden, "beam": beam,
        "chunk_ms": round(ms, 3),
        "frames_per_s": round(N * C / (ms / 1e3), 1),
        "ms_per_frame_per_stream": round(ms / C, 4),
    }


def main(*args):
    cfg = [int(a) for a in args]
    print(json.dumps(bench_streaming(*cfg)), flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
