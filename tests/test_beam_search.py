"""Beam search: B=1 equals greedy; wider beams never score worse."""

import numpy as np
import jax
import jax.numpy as jnp

from warp_rnnt_tpu.models import init_model
from warp_rnnt_tpu.models.beam_search import beam_decode
from warp_rnnt_tpu.models.decoding import greedy_decode


def _setup():
    model, params, batch = init_model(
        jax.random.PRNGKey(3), vocab_size=11, feat_dim=8,
        N=4, T=12, U=5,
        encoder_hidden=16, predictor_hidden=16, joint_hidden=16,
    )
    feats, _, xn, _ = batch
    xn = jnp.asarray([12, 9, 12, 7], jnp.int32)
    return model, params, feats, xn


def test_beam1_matches_greedy():
    model, params, feats, xn = _setup()
    g_tok, g_len = greedy_decode(model, params, feats, xn, max_length=8,
                                 max_symbols_per_step=3)
    b_tok, b_len, _ = beam_decode(model, params, feats, xn, max_length=8,
                                  beam_size=1, max_symbols_per_step=3)
    np.testing.assert_array_equal(np.asarray(g_len), np.asarray(b_len))
    for n in range(4):
        L = int(g_len[n])
        np.testing.assert_array_equal(
            np.asarray(g_tok[n][:L]), np.asarray(b_tok[n][:L])
        )


def _alignment_score_of(model, params, feats, xn, tokens, length):
    """Best-alignment log-prob of a single hypothesis under the model, via
    the Viterbi alignment on the full joint lattice (independent code path)."""
    from warp_rnnt_tpu.functional.alignment import rnnt_alignment

    L = int(length)
    ys = jnp.asarray(tokens[:L], jnp.int32)[None, :]
    if L == 0:
        ys = jnp.zeros((1, 0), jnp.int32)
    lp = model.apply(params, feats[None], ys)  # (1, T, L+1, V) log-probs
    scores, _ = rnnt_alignment(
        lp, ys, xn[None], jnp.asarray([L], jnp.int32), blank=0
    )
    return float(scores[0])


def test_beam_scores_are_self_consistent():
    """The returned score is the log-prob of ONE alignment of the returned
    sequence, so it must never exceed that sequence's Viterbi score (and
    should be close to it — the beam tracks near-best alignments)."""
    model, params, feats, xn = _setup()
    for B in (1, 4):
        tok, ln, sc = beam_decode(model, params, feats, xn, max_length=8,
                                  beam_size=B, max_symbols_per_step=3)
        for n in range(feats.shape[0]):
            viterbi = _alignment_score_of(
                model, params, feats[n], xn[n], np.asarray(tok[n]), ln[n]
            )
            assert float(sc[n]) <= viterbi + 1e-4, (B, n, float(sc[n]), viterbi)
            assert np.isfinite(float(sc[n]))


def test_beam_finds_brute_force_optimum_on_tiny_space():
    """With a beam wide enough to hold every reachable hypothesis, the search
    must return the globally best label sequence (by best-alignment score)."""
    import itertools

    model, params, batch = init_model(
        jax.random.PRNGKey(7), vocab_size=3, feat_dim=6,
        N=1, T=4, U=3,
        encoder_hidden=8, predictor_hidden=8, joint_hidden=8,
    )
    feats, _, _, _ = batch
    feats = feats[:1]
    xn = jnp.asarray([4], jnp.int32)

    best = -np.inf
    for k in range(0, 3):
        for seq in itertools.product((1, 2), repeat=k):
            s = _alignment_score_of(model, params, feats[0], xn[0],
                                    np.asarray(seq + (0,) * 4), k)
            best = max(best, s)

    _, _, sc = beam_decode(model, params, feats, xn, max_length=2,
                           beam_size=16, max_symbols_per_step=2)
    np.testing.assert_allclose(float(sc[0]), best, rtol=2e-5, atol=2e-5)


def test_beam_decode_jits():
    model, params, feats, xn = _setup()
    fn = jax.jit(
        lambda f, x: beam_decode(model, params, f, x, max_length=8,
                                 beam_size=3, max_symbols_per_step=2)
    )
    tok, ln, sc = fn(feats, xn)
    assert tok.shape == (4, 8) and ln.shape == (4,) and sc.shape == (4,)
    assert np.all(np.isfinite(np.asarray(sc)))
    assert np.all(np.asarray(ln) <= 8)


def test_beam_widths_all_finite():
    """Dedup must never kill every beam: the best hypothesis survives at
    every width."""
    model, params, feats, xn = _setup()
    for B in (2, 4, 8):
        _, _, sc = beam_decode(model, params, feats, xn, max_length=6,
                               beam_size=B, max_symbols_per_step=2)
        assert np.all(np.isfinite(np.asarray(sc)))


def test_dedup_improves_or_preserves_brute_force_exactness():
    """With dedup, a moderate beam already covers the tiny search space."""
    import itertools

    model, params, batch = init_model(
        jax.random.PRNGKey(11), vocab_size=3, feat_dim=6,
        N=1, T=4, U=3,
        encoder_hidden=8, predictor_hidden=8, joint_hidden=8,
    )
    feats, _, _, _ = batch
    feats = feats[:1]
    xn = jnp.asarray([4], jnp.int32)

    best = -np.inf
    for k in range(0, 3):
        for seq in itertools.product((1, 2), repeat=k):
            s = _alignment_score_of(model, params, feats[0], xn[0],
                                    np.asarray(seq + (0,) * 4), k)
            best = max(best, s)

    # without dedup this needed B=16; the deduped search space (7 distinct
    # sequences) fits in B=8
    _, _, sc = beam_decode(model, params, feats, xn, max_length=2,
                           beam_size=8, max_symbols_per_step=2)
    np.testing.assert_allclose(float(sc[0]), best, rtol=2e-5, atol=2e-5)


def test_top_k_small_matches_lax_top_k():
    """The iterative-argmax top-k (the TPU sort-free replacement, see
    benchmarks_endtoend.json:decode.ablation) is exact: values AND indices
    match lax.top_k, including lowest-index tie-breaks and NEG sentinels."""
    from warp_rnnt_tpu.models.beam_search import NEG, _top_k_small

    x = jax.random.normal(jax.random.PRNGKey(0), (5, 3, 29))
    # inject ties and dead-beam sentinel values
    x = x.at[0, 0, 4].set(x[0, 0, 17])
    x = x.at[1, :, :].set(NEG)
    x = x.at[2, 1, 5:].set(NEG)
    for k in (1, 2, 4, 7):
        v_ref, i_ref = jax.lax.top_k(x, k)
        v, i = _top_k_small(x, k)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref))


def test_top_k_small_distinct_indices_with_inf_masks():
    """Slices with fewer than k finite entries (the -inf vocab-masking
    idiom) must still return DISTINCT indices, falling back to ascending
    first-unpicked positions exactly as lax.top_k does — the pre-fix
    iterative argmax returned duplicate index 0 once every remaining entry
    was -inf."""
    from warp_rnnt_tpu.models.beam_search import _top_k_small

    neg = -jnp.inf
    x = jnp.asarray([
        [neg, neg, neg, neg, neg],        # nothing finite
        [neg, 2.0, neg, neg, neg],        # one finite
        [1.0, neg, 3.0, neg, neg],        # two finite
        [5.0, 4.0, 3.0, 2.0, 1.0],        # all finite
    ], jnp.float32)
    for k in (2, 3, 4):
        v_ref, i_ref = jax.lax.top_k(x, k)
        v, i = _top_k_small(x, k)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref))
        # distinctness per row, independently of the reference
        for row in np.asarray(i):
            assert len(set(row.tolist())) == k
