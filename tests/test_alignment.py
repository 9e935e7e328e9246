"""Viterbi forced alignment vs a brute-force path enumeration oracle."""

import itertools

import numpy as np
import jax.numpy as jnp

from warp_rnnt_tpu.functional.alignment import rnnt_alignment
from warp_rnnt_tpu.functional.loss import rnnt_loss


def brute_force_best_path(blank_lp, emit_lp, T, yn):
    """Enumerate all monotonic (T, U) paths: T-1 blank moves + yn emit moves
    in any order, then the terminal blank at (T-1, yn).  Returns
    (best_score, label_frames)."""
    best = (-np.inf, None)
    for emits in itertools.combinations(range(T - 1 + yn), yn):
        t, u, score, frames = 0, 0, 0.0, []
        for i in range(T - 1 + yn):
            if i in emits:
                score += emit_lp[t, u]
                frames.append(t)
                u += 1
            else:
                score += blank_lp[t, u]
                t += 1
        score += blank_lp[T - 1, yn]
        if score > best[0]:
            best = (score, frames)
    return best


def test_alignment_matches_brute_force():
    rng = np.random.RandomState(0)
    N, T, U = 5, 5, 4  # up to C(7,3)=35 paths per sample
    blank_lp = np.log(rng.rand(N, T, U).astype(np.float32))
    emit_lp = np.log(rng.rand(N, T, U).astype(np.float32))
    xn = np.array([5, 4, 5, 3, 5], np.int32)
    yn = np.array([3, 2, 0, 3, 1], np.int32)

    xs = jnp.stack([jnp.asarray(blank_lp), jnp.asarray(emit_lp)], axis=-1)
    scores, frames = rnnt_alignment(xs, jnp.zeros((N, U - 1), jnp.int32),
                                    xn, yn, blank=-1)
    scores, frames = np.asarray(scores), np.asarray(frames)

    for n in range(N):
        exp_score, exp_frames = brute_force_best_path(
            blank_lp[n], emit_lp[n], int(xn[n]), int(yn[n])
        )
        np.testing.assert_allclose(scores[n], exp_score, rtol=1e-5)
        got = list(frames[n][: yn[n]])
        assert got == exp_frames, (n, got, exp_frames)
        assert all(f == -1 for f in frames[n][yn[n]:])


def test_alignment_full_vocab_and_loss_bound():
    rng = np.random.RandomState(1)
    N, T, U, V = 4, 6, 4, 7
    logits = rng.randn(N, T, U, V).astype(np.float32)
    lp = jnp.asarray(logits) - jnp.log(
        jnp.exp(jnp.asarray(logits)).sum(-1, keepdims=True)
    )
    ys = jnp.asarray(rng.randint(1, V, (N, U - 1)), jnp.int32)
    xn = jnp.asarray([6, 5, 6, 4], jnp.int32)
    yn = jnp.asarray([3, 2, 3, 1], jnp.int32)

    scores, frames = rnnt_alignment(lp, ys, xn, yn, blank=0)
    costs = rnnt_loss(lp, ys, xn, yn, reduction="none")
    # Viterbi path is one term of the full-sum likelihood
    assert np.all(np.asarray(scores) <= -np.asarray(costs) + 1e-5)
    # frames monotone nondecreasing within each sample's labels
    f = np.asarray(frames)
    for n in range(N):
        valid = f[n][: int(yn[n])]
        assert np.all(valid >= 0) and np.all(np.diff(valid) >= 0)
        assert np.all(valid < int(xn[n]))
