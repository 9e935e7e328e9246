"""Streaming inference session: chunked == one-shot, exactly.

The exactness contract of `models/streaming.py`: any chunking of the same
features reproduces the full-utterance encoder outputs and greedy decode
bit-for-bit (the conv blocks mask out-of-stream frames to zero in LN-space,
which reproduces the SAME convolution's zero padding; the reference project
has no serving tier at all)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warp_rnnt_tpu.models import (
    greedy_decode,
    init_model,
    stream_finish,
    stream_init,
    stream_step,
)


@pytest.fixture(scope="module")
def setup():
    model, params, batch = init_model(
        jax.random.PRNGKey(0), vocab_size=21, feat_dim=9,
        N=4, T=41, U=5,
        encoder_hidden=24, predictor_hidden=24, joint_hidden=24,
    )
    feats, labels, xn, yn = batch
    return model, params, feats


def _stream_all(model, params, feats, C, xn=None, max_length=30):
    N, T, _ = feats.shape
    st = stream_init(model, params, N, max_length=max_length)
    i = 0
    while i < T:
        st = stream_step(model, params, st, feats[:, i:i + C], xn=xn)
        i += min(C, T - i)
    return stream_finish(model, params, st, xn=xn)


@pytest.mark.parametrize("C", [1, 3, 7, 41])
def test_chunked_equals_full_greedy(setup, C):
    model, params, feats = setup
    xn = jnp.asarray([41, 33, 17, 5], jnp.int32)  # ragged
    ref_tok, ref_len = greedy_decode(model, params, feats, xn, max_length=30)
    tok, ln, _ = _stream_all(model, params, feats, C, xn=xn)
    np.testing.assert_array_equal(np.asarray(ln), np.asarray(ref_len))
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tok))


def test_encoder_stream_exact_all_chunkings(setup):
    model, params, feats = setup
    bound = model.bind(params)
    full = np.asarray(bound.encode(feats))
    N, T, _ = feats.shape
    BIG = jnp.asarray(2 ** 30, jnp.int32)
    for C in (1, 2, 5, 13, T):
        st = bound.encoder.stream_init(N)
        got = np.zeros_like(full)

        def put(out, p0):
            o = np.asarray(out)
            for j in range(o.shape[1]):
                if 0 <= int(p0) + j < T:
                    got[:, int(p0) + j] = o[:, j]

        i = 0
        while i < T:
            st, out, p0 = bound.encoder.stream(st, feats[:, i:i + C], BIG)
            put(out, p0)
            i += min(C, T - i)
        st, out, p0 = bound.encoder.stream_finish(
            st, jnp.asarray(T, jnp.int32)
        )
        put(out, p0)
        np.testing.assert_allclose(got, full, rtol=0, atol=0,
                                   err_msg=f"chunk size {C}")


def test_jitted_step_reuses_one_compile(setup):
    """The session is fixed-shape: a jitted step must serve every chunk of
    the same size without retracing, and mixed chunk sizes just use one
    compile per size."""
    model, params, feats = setup
    N, T, _ = feats.shape
    xn = jnp.full((N,), T, jnp.int32)
    ref_tok, ref_len = greedy_decode(model, params, feats, xn, max_length=30)

    traces = {"n": 0}
    base_step = partial(stream_step, model, params)

    def counting(state, chunk):
        traces["n"] += 1
        return base_step(state, chunk)

    step = jax.jit(counting)
    st = stream_init(model, params, N, max_length=30)
    C = 6
    n_whole = (T // C) * C
    for i in range(0, n_whole, C):
        st = step(st, feats[:, i:i + C])
    if n_whole < T:
        st = stream_step(model, params, st, feats[:, n_whole:])
    tok, ln, _ = stream_finish(model, params, st)
    assert traces["n"] == 1, "jitted step retraced"
    np.testing.assert_array_equal(np.asarray(ln), np.asarray(ref_len))
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tok))


def test_stream_state_is_resumable_midway(setup):
    """Session state is a plain pytree: decoding can stop and resume (e.g.
    checkpointed across serving processes) with no drift."""
    model, params, feats = setup
    N, T, _ = feats.shape
    xn = jnp.full((N,), T, jnp.int32)
    ref_tok, ref_len = greedy_decode(model, params, feats, xn, max_length=30)
    st = stream_init(model, params, N, max_length=30)
    st = stream_step(model, params, st, feats[:, :20])
    # round-trip the state through host numpy (what a checkpoint would do)
    st = jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)), st)
    st = stream_step(model, params, st, feats[:, 20:])
    tok, ln, _ = stream_finish(model, params, st)
    np.testing.assert_array_equal(np.asarray(ln), np.asarray(ref_len))
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tok))


@pytest.mark.parametrize("C", [5, 16])
def test_chunked_beam_equals_full_beam(setup, C):
    """Beam sessions share the exactness contract: the beam drain is
    strictly per-frame sequential, so pausing at chunk boundaries cannot
    change tokens, lengths, OR best-alignment scores."""
    from warp_rnnt_tpu.models import beam_decode

    model, params, feats = setup
    N, T, _ = feats.shape
    xn = jnp.asarray([41, 33, 17, 5], jnp.int32)
    ref_tok, ref_len, ref_sc = beam_decode(
        model, params, feats, xn, max_length=30, beam_size=3
    )
    st = stream_init(model, params, N, max_length=30, beam_size=3)
    i = 0
    while i < T:
        st = stream_step(model, params, st, feats[:, i:i + C], xn=xn)
        i += min(C, T - i)
    tok, ln, sc, _ = stream_finish(model, params, st, xn=xn)
    np.testing.assert_array_equal(np.asarray(ln), np.asarray(ref_len))
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tok))
    np.testing.assert_allclose(np.asarray(sc), np.asarray(ref_sc), rtol=0)
