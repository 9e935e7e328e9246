"""Online (streaming) transcription demo: features arrive in chunks, the
session decodes incrementally, and the final transcript is verified to be
IDENTICAL to the one-shot batch decode — the `models/streaming.py`
exactness contract, live.

Runs on CPU or a single TPU chip:

    python examples/streaming_demo.py [--chunk 16] [--beam 0]
"""

from __future__ import annotations

import argparse
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from warp_rnnt_tpu.models import (
    beam_decode,
    greedy_decode,
    init_model,
    stream_finish,
    stream_init,
    stream_step,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=16, help="frames per chunk")
    ap.add_argument("--beam", type=int, default=0,
                    help="beam width (0 = greedy)")
    args = ap.parse_args()

    N, T, F, V = 4, 96, 20, 64
    model, params, batch = init_model(
        jax.random.PRNGKey(0), vocab_size=V, feat_dim=F, N=N, T=T, U=8,
        encoder_hidden=64, predictor_hidden=64, joint_hidden=64,
    )
    feats = batch[0]
    xn = jnp.full((N,), T, jnp.int32)
    ML = 32

    # --- one-shot reference -------------------------------------------------
    if args.beam:
        ref_tok, ref_len, _ = beam_decode(
            model, params, feats, xn, max_length=ML, beam_size=args.beam
        )
    else:
        ref_tok, ref_len = greedy_decode(
            model, params, feats, xn, max_length=ML
        )

    # --- streaming session --------------------------------------------------
    state = stream_init(model, params, N, max_length=ML,
                        beam_size=args.beam)
    step = jax.jit(partial(stream_step, model, params))  # one compile
    C = args.chunk
    n_whole = (T // C) * C
    for i in range(0, n_whole, C):
        state = step(state, feats[:, i:i + C])
        if args.beam:
            u = np.asarray(state["dec_beam"][3]).max(-1)  # best-case per utt
        else:
            u = np.asarray(state["dec"][1])
        print(f"after frame {i + C:3d}: emitted so far = {u}")
    if n_whole < T:  # ragged tail chunk (its own one-time compile)
        state = stream_step(model, params, state, feats[:, n_whole:])
    out = stream_finish(model, params, state)
    tok, ln = out[0], out[1]

    assert np.array_equal(np.asarray(tok), np.asarray(ref_tok))
    assert np.array_equal(np.asarray(ln), np.asarray(ref_len))
    mode = f"beam-{args.beam}" if args.beam else "greedy"
    print(f"\nstreaming ({mode}, C={C}) == one-shot decode: EXACT")
    for i in range(N):
        toks = np.asarray(tok[i, : int(ln[i])]).tolist()
        print(f"  utt {i}: {toks}")


if __name__ == "__main__":
    main()
