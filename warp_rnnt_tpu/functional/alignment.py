"""Viterbi forced alignment over the RNN-T lattice.

Beyond the reference's capability set (it is loss-only): given log-probs and
a label sequence, find the maximum-probability monotonic path through the
``(T, U)`` lattice — i.e. the frame at which each label is emitted.  Used for
word timings, streaming-training constraints, and alignment-restricted loss
variants.

Same TPU-first structure as the loss (`scan_impl.py`): the max-plus analogue
of the column recurrence

    s[t, u] = max(s[t-1, u] + blank[t-1, u],  s[t, u-1] + emit[t, u-1])

is a max-plus linear recurrence along t, solved with `lax.associative_scan`
(the tropical semiring version of `logrec_combine`); the backtrace is a
fixed-trip `lax.scan` walking winners from ``(xn-1, yn)`` back to ``(0, 0)``.
Everything is jittable, batched, and static-shaped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from warp_rnnt_tpu.utils.lse import NEG_INF


def _maxrec_combine(left, right):
    """Tropical-semiring combine for a[t] = max(a[t-1] + m[t], b[t])."""
    m1, b1 = left
    m2, b2 = right
    return m1 + m2, jnp.maximum(b2, b1 + m2)


def _viterbi_scores(blank_lp, emit_lp, xn, yn):
    """Max-plus forward scores (N, T, U); column scan mirrors scan_impl."""
    N, T, U = blank_lp.shape
    t_iota = jnp.arange(T)[None, :]
    valid_t = t_iota < xn[:, None]
    seed = jnp.where(t_iota == 0, 0.0, NEG_INF)

    blank_u = jnp.moveaxis(blank_lp, 2, 0)
    emit_prev_u = jnp.concatenate(
        [jnp.full((1, N, T), NEG_INF, blank_lp.dtype),
         jnp.moveaxis(emit_lp, 2, 0)[: U - 1]],
        axis=0,
    )

    def step(s_prev, inp):
        u, blank_col, emit_prev_col = inp
        emit_ok = ((u - 1) < yn)[:, None] & valid_t
        b = jnp.where(
            u == 0,
            jnp.broadcast_to(seed, (N, T)),
            jnp.where(emit_ok, s_prev + emit_prev_col, NEG_INF),
        )
        m = jnp.concatenate(
            [jnp.zeros((N, 1), blank_col.dtype), blank_col[:, :-1]], axis=1
        )
        _, s_col = lax.associative_scan(_maxrec_combine, (m, b), axis=-1)
        return s_col, s_col

    init = jnp.full((N, T), NEG_INF, blank_lp.dtype)
    _, scores_u = lax.scan(step, init, (jnp.arange(U), blank_u, emit_prev_u))
    return jnp.moveaxis(scores_u, 0, 2)


def rnnt_alignment(log_probs, labels, frames_lengths, labels_lengths,
                   blank: int = 0):
    """Viterbi alignment of `labels` to frames.

    Args:
      log_probs: (N, T, U, V) log-softmax outputs (U = max(yn) + 1), or a
        pre-gathered (N, T, U, 2) lattice with ``blank=-1``.
      labels: (N, U-1) int32.
      frames_lengths, labels_lengths: (N,) int32.
      blank: blank index, or -1 for pre-gathered inputs.

    Returns:
      scores: (N,) fp32 — log-probability of the best path (>= -loss, the
        Viterbi path is one term of the full-sum likelihood).
      label_frames: (N, U-1) int32 — frame index at which label u is emitted
        on the best path; -1 for u >= yn (padding).
    """
    if blank == -1:
        blank_lp = log_probs[..., 0].astype(jnp.float32)
        emit_lp = log_probs[..., 1].astype(jnp.float32)
    else:
        from warp_rnnt_tpu.functional.loss import _gather_blank_emit

        g = _gather_blank_emit(log_probs, labels, blank)
        blank_lp = g[..., 0].astype(jnp.float32)
        emit_lp = g[..., 1].astype(jnp.float32)

    N, T, U = blank_lp.shape
    xn = jnp.asarray(frames_lengths, jnp.int32)
    yn = jnp.asarray(labels_lengths, jnp.int32)

    s = _viterbi_scores(blank_lp, emit_lp, xn, yn)
    n_iota = jnp.arange(N)
    scores = s[n_iota, xn - 1, yn] + blank_lp[n_iota, xn - 1, yn]

    # Backtrace: at (t, u), the path came vertically (label u emitted at
    # frame t) iff s[t, u-1] + emit[t, u-1] >= s[t-1, u] + blank[t-1, u].
    # Walk from (xn-1, yn) for a static T+U trip count; finished lanes idle.
    s_pad = jnp.pad(s, ((0, 0), (1, 0), (1, 0)), constant_values=NEG_INF)
    blank_pad = jnp.pad(blank_lp, ((0, 0), (1, 0), (0, 0)),
                        constant_values=NEG_INF)
    emit_pad = jnp.pad(emit_lp, ((0, 0), (0, 0), (1, 0)),
                       constant_values=NEG_INF)

    def bt_step(carry, _):
        t, u, frames = carry
        done = (t <= 0) & (u <= 0)
        # s_pad[n, t, u+? ] indexing: s_pad[n, a, b] == s[n, a-1, b-1]
        via_emit = (
            s_pad[n_iota, t + 1, u] + emit_pad[n_iota, t, u]
        )  # s[t, u-1] + emit[t, u-1]
        via_blank = (
            s_pad[n_iota, t, u + 1] + blank_pad[n_iota, t, u]
        )  # s[t-1, u] + blank[t-1, u]
        take_emit = (~done) & (u > 0) & ((t == 0) | (via_emit >= via_blank))
        # label index u-1 was emitted at frame t
        frames = jnp.where(
            take_emit[:, None]
            & (jnp.arange(frames.shape[1])[None, :] == (u - 1)[:, None]),
            t[:, None],
            frames,
        )
        t = jnp.where(done | take_emit, t, t - 1)
        u = jnp.where(take_emit, u - 1, u)
        return (t, u, frames), None

    frames0 = jnp.full((N, max(U - 1, 1)), -1, jnp.int32)
    (t_f, u_f, label_frames), _ = lax.scan(
        bt_step, (xn - 1, yn, frames0), None, length=T + U
    )
    return scores, label_frames[:, : U - 1]
