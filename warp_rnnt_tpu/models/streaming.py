"""Streaming (chunked) transducer inference session.

The reference project is loss-only; this is the serving tier's online
counterpart to `decoding.greedy_decode`: features arrive in chunks, the
encoder runs statefully (per-conv-block caches, algorithmic delay =
`encoder.lookahead` frames), and greedy decoding advances incrementally as
encoder frames become available.  Everything is a fixed-shape pytree in /
out, so each phase jits once and is reused for the whole stream — the TPU
shape for real-time serving (no per-chunk recompilation, no host round
trips inside a chunk).

Exactness contract (tested, `tests/test_streaming.py`): feeding the same
(N, T, F) features through any chunking — any mix of chunk sizes, ragged
tail included — reproduces the one-shot `greedy_decode` (or, with
``beam_size`` > 0, `beam_decode`: tokens, lengths AND scores) EXACTLY.
The encoder achieves this by masking out-of-stream frames to zero
in LN-space inside each conv block, which makes the chunked computation's
warm-up/flush rows act precisely like the full-utterance SAME convolution's
zero padding (`transducer.ConvBlock.stream`).

Typical use::

    state = stream_init(model, params, N=8, max_length=64)
    step = jax.jit(partial(stream_step, model, params))   # one compile
    for chunk in feature_chunks:                          # (N, C, F) each
        state = step(state, chunk)
    tokens, lengths, state = stream_finish(model, params, state)

For batch-padded inputs with ragged valid lengths, pass the same ``xn`` to
every `stream_step` call and to `stream_finish` — decoding then stops
per-sample at xn exactly as `greedy_decode` does.
"""

from __future__ import annotations

import jax.numpy as jnp

from warp_rnnt_tpu.models.beam_search import (
    beam_best,
    beam_drain,
    beam_state_init,
)
from warp_rnnt_tpu.models.decoding import greedy_drain, greedy_state_init

_NO_LIMIT = 2 ** 30  # "more frames are coming" sentinel for the encoder


def stream_init(model, params, N: int, max_length: int, blank: int = 0,
                beam_size: int = 0):
    """A fresh streaming session state (a fixed-shape pytree).

    ``max_length`` bounds emitted tokens per utterance (the token buffer
    shape); ``blank`` must match the values passed to step/finish.
    ``beam_size`` > 0 makes it a beam-search session (same exactness
    contract vs the one-shot `beam_decode`; `stream_finish` then also
    returns the best-alignment scores).
    """
    bound = model.bind(params)
    if beam_size:
        dec = beam_state_init(bound, N, beam_size, max_length, blank)
        key = "dec_beam"
    else:
        dec = greedy_state_init(bound, N, max_length, blank)
        key = "dec"
    return {"enc": bound.encoder.stream_init(N), key: dec}


def stream_step(model, params, state, feats_chunk, xn=None,
                max_symbols_per_step: int = 4, blank: int = 0):
    """Feed a chunk of raw feature frames (N, C, F); returns the new state.

    Encoder frames for stream positions [m-R, m+C-R) become available
    (R = encoder.lookahead, m = frames fed before this chunk) and are
    decoded immediately.  ``xn`` (N,) optionally caps per-sample decoding
    at a known valid length (pass the same array every call); by default
    every fed frame is decoded.
    """
    bound = model.bind(params)
    enc_state, out, p0 = bound.encoder.stream(
        state["enc"], feats_chunk, jnp.asarray(_NO_LIMIT, jnp.int32)
    )
    avail = p0 + feats_chunk.shape[1]  # positions < avail are final
    bound_frames = jnp.maximum(avail, 0)
    if xn is not None:
        bound_frames = jnp.minimum(jnp.asarray(xn, jnp.int32), bound_frames)
    if "dec_beam" in state:
        dec = beam_drain(
            bound, state["dec_beam"], out, p0, bound_frames,
            max_symbols_per_step=max_symbols_per_step, blank=blank,
        )
        return {"enc": enc_state, "dec_beam": dec}
    dec = greedy_drain(
        bound, state["dec"], out, p0, bound_frames,
        max_symbols_per_step=max_symbols_per_step, blank=blank,
    )
    return {"enc": enc_state, "dec": dec}


def stream_finish(model, params, state, xn=None,
                  max_symbols_per_step: int = 4, blank: int = 0):
    """End the stream: flush the encoder lookahead, decode the tail, and
    return (tokens (N, max_length), lengths (N,), final_state) — beam
    sessions return (tokens, lengths, scores, final_state)."""
    bound = model.bind(params)
    L = state["enc"]["m"]
    enc_state, out, p0 = bound.encoder.stream_finish(state["enc"], L)
    bound_frames = L if xn is None else jnp.minimum(
        jnp.asarray(xn, jnp.int32), L
    )
    if "dec_beam" in state:
        dec = beam_drain(
            bound, state["dec_beam"], out, p0, bound_frames,
            max_symbols_per_step=max_symbols_per_step, blank=blank,
        )
        tokens, lengths, scores = beam_best(dec)
        return tokens, lengths, scores, {"enc": enc_state, "dec_beam": dec}
    dec = greedy_drain(
        bound, state["dec"], out, p0, bound_frames,
        max_symbols_per_step=max_symbols_per_step, blank=blank,
    )
    state = {"enc": enc_state, "dec": dec}
    return dec[6], dec[1], state
