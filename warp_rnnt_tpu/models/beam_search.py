"""Batched RNN-T beam search (time-synchronous, jittable).

Beyond the reference's capability set (loss-only).  TPU-first design: no
data-dependent control flow — a `lax.fori_loop` over frames with a statically
unrolled expansion loop inside each frame, fixed beam width, dense top-k
candidate selection, and beam-indexed gathers for all per-hypothesis state
(tokens, predictor carries).

Algorithm (time-synchronous decoding with bounded expansions, in the family
of Graves 2012 beam search / TSD):

  per frame t, repeat `max_symbols_per_step` times then once more forced:
    * every ACTIVE beam proposes 1 blank candidate (settles the beam for
      this frame) and its top-`beam_size` label candidates (emit: append
      token, advance the predictor, stay active);
    * every SETTLED beam proposes itself unchanged;
    * dense `top_k` over the (beam_size * (beam_size+1)) candidates keeps
      `beam_size` hypotheses.

Duplicate hypotheses (identical label prefixes reached via different
expansion orders) are MAX-merged after every selection — the better-scored
copy survives and the dead slots free up for diversity.  Summing distinct
alignments of the same sequence (posterior merging) is intentionally
omitted; scores are best-alignment (Viterbi-style) scores, the usual choice
for production transducer decoders.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG = -1.0e30


def beam_decode(model, params, feats, xn, max_length: int,
                beam_size: int = 4, max_symbols_per_step: int = 4,
                blank: int = 0):
    """Batched beam search.

    Args:
      model: a `Transducer` (encode / predictor_init / predictor_step /
        joint_step, as used by `greedy_decode`).
      params: model variables.
      feats: (N, T, F) features;  xn: (N,) int32 valid frame counts.
      max_length: static bound on emitted symbols per utterance.
      beam_size: fixed beam width B.
      max_symbols_per_step: emission expansions per frame before a forced
        blank.
      blank: blank id.

    Returns:
      tokens (N, max_length) int32 of the best hypothesis (blank-padded),
      lengths (N,) int32, scores (N,) fp32 (best-alignment log-prob).
    """
    bound = model.bind(params)
    enc = bound.encode(feats)  # (N, T, H)
    N, T, H = enc.shape
    B = beam_size
    L = max_length
    xn = jnp.asarray(xn, jnp.int32)

    def pred_step(state, tokens_nb):  # tokens (N, B) -> out (N, B, H)
        flat_state = jax.tree_util.tree_map(
            lambda x: x.reshape((N * B,) + x.shape[2:]), state
        )
        new_flat, out = bound.predictor_step(flat_state, tokens_nb.reshape(-1))
        new_state = jax.tree_util.tree_map(
            lambda x: x.reshape((N, B) + x.shape[1:]), new_flat
        )
        return new_state, out.reshape(N, B, -1)

    def gather_beams(tree, parent):  # parent (N, B) int32
        return jax.tree_util.tree_map(
            lambda x: jnp.take_along_axis(
                x, parent.reshape((N, B) + (1,) * (x.ndim - 2)), axis=1
            ),
            tree,
        )

    def frame_body(t, state):
        scores, tokens, u, waiting, pred_state, pred_out = state
        frame_on = (t < xn)[:, None]  # (N, 1)
        f_t = jax.lax.dynamic_slice_in_dim(enc, t, 1, axis=1)  # (N, 1, H)

        def one_step(scores, tokens, u, waiting, pred_state, pred_out,
                     forced: bool):
            logp = bound.joint_step(
                jnp.broadcast_to(f_t, (N, B, H)).reshape(N * B, H),
                pred_out.reshape(N * B, -1),
            ).reshape(N, B, -1)  # (N, B, V)

            expandable = frame_on & ~waiting & (u < L)
            if forced:
                expandable = jnp.zeros_like(expandable)

            # column 0: blank (active beams) / self (settled or off-frame)
            settle = jnp.where(
                frame_on & ~waiting, scores + logp[..., blank], scores
            )
            # columns 1..K: top-K labels (blank masked out)
            V = logp.shape[-1]
            K = min(B, V - 1)
            lab_logp = logp.at[..., blank].set(NEG)
            top_lp, top_ids = jax.lax.top_k(lab_logp, K)  # (N, B, K)
            lab_scores = jnp.where(
                expandable[..., None], scores[..., None] + top_lp, NEG
            )
            cand = jnp.concatenate([settle[..., None], lab_scores], -1)

            new_scores, sel = jax.lax.top_k(cand.reshape(N, B * (K + 1)), B)
            parent = (sel // (K + 1)).astype(jnp.int32)  # (N, B)
            kind = (sel % (K + 1)).astype(jnp.int32)  # 0 = blank/self

            tokens, u, waiting, pred_state, pred_out = (
                gather_beams(tokens, parent),
                jnp.take_along_axis(u, parent, 1),
                jnp.take_along_axis(waiting, parent, 1),
                gather_beams(pred_state, parent),
                gather_beams(pred_out, parent),
            )
            scores = new_scores
            emit = kind > 0
            if forced:
                # no expansion is permitted on the forced-blank step
                # (expandable was zeroed above), so every finite-score
                # candidate is a settle (kind == 0); only dead NEG beams can
                # select a label here, and their state is immaterial — skip
                # the predictor advance and token bookkeeping entirely.
                emit = jnp.zeros_like(emit)
            else:
                new_tok = jnp.take_along_axis(
                    jnp.take_along_axis(top_ids, parent[..., None], 1),
                    jnp.maximum(kind - 1, 0)[..., None], 2,
                )[..., 0]  # (N, B)
                tokens = jnp.where(
                    emit[..., None]
                    & (jnp.arange(L)[None, None, :] == u[..., None]),
                    new_tok[..., None], tokens,
                )
                adv_state, adv_out = pred_step(pred_state, new_tok)
                pred_state = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(
                        emit.reshape((N, B) + (1,) * (new.ndim - 2)), new, old
                    ),
                    adv_state, pred_state,
                )
                pred_out = jnp.where(emit[..., None], adv_out, pred_out)
                u = jnp.where(emit, u + 1, u)
            # blank/self settles the beam for this frame; emits stay active
            waiting = jnp.where(emit, waiting, frame_on | waiting) & frame_on

            # merge duplicate hypotheses: two beams with identical token
            # sequences (padding is always `blank`, so full-L equality ==
            # same prefix) and the same within-frame state are the same
            # hypothesis — keep the better-scored copy (max-merge, i.e.
            # Viterbi semantics), NEG out the rest so the slots free up.
            same_tok = jnp.all(
                tokens[:, :, None, :] == tokens[:, None, :, :], axis=-1
            )
            same = same_tok & (waiting[:, :, None] == waiting[:, None, :])
            s_i = scores[:, :, None]  # score of beam i
            s_j = scores[:, None, :]  # score of beam j
            i_iota = jnp.arange(B)[None, :, None]
            j_iota = jnp.arange(B)[None, None, :]
            beats = (s_i > s_j) | ((s_i == s_j) & (i_iota < j_iota))
            killed = jnp.any(same & beats & (i_iota != j_iota), axis=1)
            scores = jnp.where(killed, NEG, scores)
            return scores, tokens, u, waiting, pred_state, pred_out

        # Early-exit expansion: a step where NO beam is expandable only
        # settles/self-selects (provably a no-op followed by the forced
        # settle), so loop while any beam can still emit — on typical ASR
        # (~0.1 symbols/frame) this runs ~1-2 joint evaluations per frame
        # instead of always max_symbols_per_step, halving the decoder's
        # sequential op count.
        def expand_cond(carry):
            step, _, _, u_, waiting_, _, _ = carry
            expandable = frame_on & ~waiting_ & (u_ < L)
            return (step < max_symbols_per_step) & jnp.any(expandable)

        def expand_body(carry):
            step = carry[0]
            return (step + 1,) + one_step(*carry[1:], forced=False)

        carry = (jnp.int32(0), scores, tokens, u, waiting, pred_state,
                 pred_out)
        carry = jax.lax.while_loop(expand_cond, expand_body, carry)
        # forced settle: remaining active beams take their blank transition
        scores, tokens, u, waiting, pred_state, pred_out = one_step(
            *carry[1:], forced=True
        )

        waiting = jnp.zeros_like(waiting)  # next frame: all beams active
        return scores, tokens, u, waiting, pred_state, pred_out

    pred_state0 = bound.predictor_init(N * B)
    pred_state0 = jax.tree_util.tree_map(
        lambda x: x.reshape((N, B) + x.shape[1:]), pred_state0
    )
    _, out0 = bound.predictor_step(
        jax.tree_util.tree_map(
            lambda x: x.reshape((N * B,) + x.shape[2:]), pred_state0
        ),
        jnp.full((N * B,), -1, jnp.int32),
    )
    init = (
        jnp.concatenate(
            [jnp.zeros((N, 1)), jnp.full((N, B - 1), NEG)], 1
        ).astype(jnp.float32),  # only beam 0 live initially
        jnp.full((N, B, L), blank, jnp.int32),
        jnp.zeros((N, B), jnp.int32),
        jnp.zeros((N, B), bool),
        pred_state0,
        out0.reshape(N, B, -1),
    )
    scores, tokens, u, _, _, _ = jax.lax.fori_loop(0, T, frame_body, init)

    best = jnp.argmax(scores, axis=1)
    n_iota = jnp.arange(N)
    return tokens[n_iota, best], u[n_iota, best], scores[n_iota, best]
