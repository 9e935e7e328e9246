"""Alignment-restricted RNN-T loss (AR-RNNT, arXiv:2011.03072 semantics).

Beyond the reference's capability set.  Given a reference alignment (frame
``label_frames[u]`` at which label u+1 is known to occur — e.g. from a
bootstrap model via `rnnt_alignment`, or external forced alignment),
emissions of label u+1 are only permitted inside the band

    label_frames[u] - left_context <= t <= label_frames[u] + right_context

All lattice paths that emit outside the band are pruned from the sum; their
cells receive exactly zero gradient.  Training with a finite right context
bounds label delay — the standard recipe for streaming transducers.

TPU-first realization: rather than a dedicated banded kernel, the emit
channel of the gathered ``(N, T, U, 2)`` lattice is masked to -inf outside
the band and fed to the SAME fused column-sweep core (`rnnt_core`).  Cells
unreachable under the restriction get -inf alphas/betas automatically, so
costs, gradients, and the beta-only inference path all inherit the
restriction with no new kernel surface.  (A band-pruned kernel that skips
the masked compute is a further optimization, not a semantic change.)
"""

from __future__ import annotations

import jax.numpy as jnp

from warp_rnnt_tpu.functional.core import rnnt_core
from warp_rnnt_tpu.functional.loss import _gather_blank_emit


def rnnt_loss_restricted(
    log_probs,
    labels,
    frames_lengths,
    labels_lengths,
    label_frames,
    left_context: int = 15,
    right_context: int = 5,
    average_frames: bool = False,
    reduction=None,
    blank: int = 0,
    fastemit_lambda: float = 0.0,
    impl: str = "auto",
):
    """Alignment-restricted RNN-T loss.

    Args:
      log_probs: (N, T, U, V) log-softmax outputs, or pre-gathered
        (N, T, U, 2) with ``blank=-1``.
      labels: (N, U-1) int32.
      frames_lengths, labels_lengths: (N,) int32.
      label_frames: (N, U-1) int32 — reference frame of each label
        (entries for u >= labels_lengths[n] are ignored).
      left_context, right_context: band half-widths in frames.
      Remaining args as in `rnnt_loss`.

    Returns:
      Loss with shape (N,) for reduction='none', else scalar.
    """
    if reduction not in (None, "none", "mean", "sum"):
        raise ValueError(
            f"Unknown reduction method: {reduction}, expected to be one of"
            " ['mean', 'sum', 'none']"
        )
    xn = jnp.asarray(frames_lengths, jnp.int32)
    yn = jnp.asarray(labels_lengths, jnp.int32)

    if blank == -1:
        xs_gathered = log_probs
        N, T, U, _ = log_probs.shape
    else:
        N, T, U, _ = log_probs.shape
        xs_gathered = _gather_blank_emit(log_probs, labels, blank)

    lf = jnp.asarray(label_frames, jnp.int32)
    if lf.shape != (N, U - 1):
        raise ValueError(
            f"label_frames must have shape (N, U-1) = ({N}, {U - 1}),"
            f" got {lf.shape}"
        )
    # band for the emission OUT of row u (label u+1); row U-1 never emits
    lf_row = jnp.concatenate(
        [lf, jnp.zeros((N, 1), jnp.int32)], axis=1
    )  # (N, U)
    t_iota = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    lo = (lf_row - left_context)[:, None, :]
    hi = (lf_row + right_context)[:, None, :]
    in_band = (t_iota >= lo) & (t_iota <= hi)  # (N, T, U)

    NEG = jnp.float32(-1.0e30)
    emit = jnp.where(in_band, xs_gathered[..., 1], NEG)
    xs_masked = jnp.stack([xs_gathered[..., 0], emit], axis=-1)

    costs = rnnt_core(xs_masked, xn, yn, fastemit_lambda, impl)
    # Infeasible-band contract: if the restriction prunes EVERY path (e.g.
    # the bands force labels out of order), beta[0,0] is the NEG sentinel and
    # the raw cost comes back ~1e30.
    #   * reduction='none': the sample's cost surfaces as +inf — unambiguous
    #     and propagating — with exactly-zero gradients (the jnp.where
    #     cotangent for the inf branch is 0, which kills the whole sample in
    #     rnnt_core's elementwise-multiply backward).
    #   * reduction='sum'|'mean': infeasible samples are EXCLUDED from the
    #     reduction ('mean' divides by the feasible count), so one bad
    #     alignment cannot turn the whole batch's loss into +inf and stall
    #     training; their gradients stay exactly zero.  An all-infeasible
    #     batch reduces to 0.0 with zero gradients.
    # Both halves are tested in tests/test_restricted.py.
    feasible = costs < -0.5 * NEG
    costs = jnp.where(feasible, costs, jnp.inf)
    if average_frames:
        costs = costs / xn.astype(costs.dtype)
    if reduction in (None, "none"):
        return costs
    safe = jnp.where(feasible, costs, 0.0)
    if reduction == "sum":
        return safe.sum()
    return safe.sum() / jnp.maximum(feasible.sum(), 1).astype(safe.dtype)
