"""Public RNN-T loss API.

Mirrors the reference Python surface (`pytorch_binding/warp_rnnt/__init__.py:
57-143`): same argument names, same options (`average_frames`, `reduction`,
`blank`, `gather`, `fastemit_lambda`, `compact`), same `blank=-1` sentinel for
pre-gathered (N, T, U, 2) inputs — re-designed for JAX: functional, jittable,
differentiable via `jax.grad` end-to-end.

TPU note: the reference's gather=False path runs dedicated full-vocab CUDA
kernels while gather=True pre-gathers to (N, T, U, 2) and runs 2-wide kernels
(`core.cu` vs `core_gather.cu`).  On TPU the gathered lattice is the superior
layout for every vocabulary size, so BOTH flags lower to an in-graph
`take_along_axis` (whose VJP scatters gradients back into the (N, T, U, V)
log-prob tensor, reproducing the reference's zero-elsewhere gradient layout)
followed by the same core.  The flag is accepted for API compatibility.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from warp_rnnt_tpu.functional.core import rnnt_core, rnnt_core_with_internals
from warp_rnnt_tpu.functional.gather import (
    gather_blank_label,
    gather_blank_label_flat,
)


def _gather_blank_emit(log_probs, labels, blank):
    """(N, T, U, V) + (N, U-1) labels -> gathered (N, T, U, 2).

    Channel 0 is the blank log-prob everywhere; channel 1 is the log-prob of
    the NEXT label y_{u+1} for rows u < U-1 and the blank for the last row —
    the exact index construction of the reference gather trick
    (`pytorch_binding/warp_rnnt/__init__.py:118-128`).  Differentiable with a
    dense scatter-free VJP (see `warp_rnnt_tpu.functional.gather`).
    """
    N, T, U, V = log_probs.shape
    if labels.shape != (N, U - 1):
        raise ValueError(
            f"labels must have shape (N, U-1) = ({N}, {U - 1}), got {labels.shape}"
        )
    labels_ext = jnp.concatenate(
        [labels.astype(jnp.int32), jnp.full((N, 1), blank, jnp.int32)], axis=1
    )  # (N, U)
    loc = jnp.broadcast_to(labels_ext[:, None, :], (N, T, U))
    return gather_blank_label(log_probs, loc, blank)


def _gather_blank_emit_flat(log_probs3, labels, blank):
    """Flat layout: (N, T, U*V) + (N, U-1) labels -> gathered (N, T, U, 2).

    Same index construction as `_gather_blank_emit` on the flat layout a
    large-V producer should emit natively (see
    `gather.gather_blank_label_flat` — the 4D layout pays a relayout copy
    above the >4 GiB gather cliff, the flat one does not).  U is derived
    from the labels (U = labels.shape[1] + 1) and V = flat_dim // U.
    """
    N, T, UV = log_probs3.shape
    U = labels.shape[1] + 1
    if labels.shape[0] != N:
        raise ValueError(
            f"labels batch dim {labels.shape[0]} != log_probs batch dim {N}"
        )
    if UV % U != 0:
        raise ValueError(
            f"flat log_probs last dim {UV} is not divisible by U={U}"
            " (expected (N, T, U*V) with U = labels.shape[1] + 1)"
        )
    V = UV // U
    labels_ext = jnp.concatenate(
        [labels.astype(jnp.int32), jnp.full((N, 1), blank, jnp.int32)], axis=1
    )
    loc = jnp.broadcast_to(labels_ext[:, None, :], (N, T, U))
    return gather_blank_label_flat(log_probs3, loc, blank, V)


def rnnt_loss(
    log_probs,
    labels,
    frames_lengths,
    labels_lengths,
    average_frames: bool = False,
    reduction: Optional[str] = "none",
    blank: int = 0,
    gather: bool = False,
    fastemit_lambda: float = 0.0,
    compact: bool = False,
    impl: str = "auto",
    max_frames: Optional[int] = None,
    max_labels: Optional[int] = None,
):
    """The TPU-native RNN-Transducer loss.

    Args:
      log_probs: (N, T, U, V) log-softmax outputs, where U = max(yn) + 1.
        A 3-D (N, T, U*V) tensor is accepted as the FLAT layout (U derived
        from the labels): semantically identical, but above the ~4 GiB
        gather cliff the flat layout is the fast one — a 4-D operand pays a
        full relayout copy to reach XLA's fast gather path (see
        `warp_rnnt_tpu.functional.gather`); producers of huge lattices
        should emit flat and gradients come back flat.
        With ``blank=-1`` a pre-gathered (N, T, U, 2) lattice is expected
        (channel 0 = blank, 1 = label), matching the reference sentinel
        (`pytorch_binding/binding.cpp:81-90`).  With ``compact=True`` a packed
        (STU, V) tensor is expected (see `warp_rnnt_tpu.functional.compact`).
      labels: (N, U-1) int32 reference labels (compact: (sum(yn),)).
      frames_lengths: (N,) int32 number of valid frames per sample.
      labels_lengths: (N,) int32 number of labels per sample.
      average_frames: divide each sample's loss by its frame count.
      reduction: 'none' | 'sum' | 'mean' (None == 'none').
      blank: blank symbol index, or -1 for pre-gathered inputs.
      gather: accepted for reference API parity; on TPU both values take the
        gathered path (see module docstring).
      fastemit_lambda: FastEmit regularization (arXiv:2010.11148).
      compact: packed ragged layout (reference compact mode).
      impl: 'auto' | 'scan' | 'pallas' backend selector.
      max_frames/max_labels: static T/U bounds, required for compact mode
        under jit (shapes cannot depend on runtime lengths).

    Returns:
      Loss with shape (N,) for reduction='none', else scalar.
    """
    if average_frames is not None and not isinstance(average_frames, bool):
        raise ValueError("average_frames must be a bool")
    if reduction not in (None, "none", "mean", "sum"):
        raise ValueError(
            f"Unknown reduction method: {reduction}, expected to be one of"
            " ['mean', 'sum', 'none']"
        )
    if not isinstance(blank, int):
        raise ValueError("blank must be an int")

    xn = jnp.asarray(frames_lengths, jnp.int32)
    yn = jnp.asarray(labels_lengths, jnp.int32)

    if compact:
        from warp_rnnt_tpu.functional.compact import rnnt_loss_compact_costs

        costs = rnnt_loss_compact_costs(
            log_probs, labels, xn, yn,
            blank=blank, fastemit_lambda=fastemit_lambda, impl=impl,
            max_frames=max_frames, max_labels=max_labels,
        )
    else:
        if log_probs.ndim not in (3, 4):
            raise ValueError(
                "log_probs must have 4 dimensions (N, T, U, V) or 3 for the"
                " flat (N, T, U*V) layout"
            )
        if blank == -1:
            if log_probs.ndim != 4 or log_probs.shape[-1] != 2:
                raise ValueError(
                    "blank=-1 expects pre-gathered log_probs with last dim 2"
                )
            xs_gathered = log_probs
        elif log_probs.ndim == 3:
            xs_gathered = _gather_blank_emit_flat(log_probs, labels, blank)
        else:
            xs_gathered = _gather_blank_emit(log_probs, labels, blank)
        costs = rnnt_core(xs_gathered, xn, yn, fastemit_lambda, impl)

    if average_frames:
        costs = costs / xn.astype(costs.dtype)

    if reduction in (None, "none"):
        return costs
    if reduction == "sum":
        return costs.sum()
    return costs.mean()


def rnnt_loss_with_internals(
    log_probs, labels, frames_lengths, labels_lengths,
    blank: int = 0, fastemit_lambda: float = 0.0, impl: str = "auto",
    return_mismatch: bool = False,
):
    """Debug/conformance entry for the padded layout.

    Returns (costs (N,), grads, alphas (N,T,U), betas (N,T,U)) where grads is
    (N, T, U, V) scattered into the full vocabulary (zeros elsewhere), or
    (N, T, U, 2) when blank=-1.

    With ``return_mismatch=True`` a fifth element is appended: the (N,) bool
    numerical-canary mask (True = that sample tripped the forward/backward
    consistency check, its grads were zeroed and its cost averaged —
    reference `core.cu:343-369`).  Set the env var ``WARP_RNNT_DEBUG=1`` to
    additionally `jax.debug.print` a warning whenever the canary trips
    (reference `core.cu:353-354`).
    """
    from warp_rnnt_tpu.functional.postprocess import mismatch_mask

    xn = jnp.asarray(frames_lengths, jnp.int32)
    yn = jnp.asarray(labels_lengths, jnp.int32)
    if blank == -1:
        xs_gathered = log_probs
        costs, grads_g, alphas, betas = rnnt_core_with_internals(
            xs_gathered, xn, yn, fastemit_lambda, impl
        )
        if return_mismatch:
            bad = mismatch_mask(xs_gathered[..., 0], alphas, betas, xn, yn)
            return costs, grads_g, alphas, betas, bad
        return costs, grads_g, alphas, betas

    N, T, U, V = log_probs.shape
    xs_gathered = _gather_blank_emit(log_probs, labels, blank)
    costs, grads_g, alphas, betas = rnnt_core_with_internals(
        xs_gathered, xn, yn, fastemit_lambda, impl
    )
    # Scatter the 2-wide grads back into (N, T, U, V) (zeros elsewhere).
    labels_ext = jnp.concatenate(
        [labels.astype(jnp.int32), jnp.full((N, 1), blank, jnp.int32)], axis=1
    )
    grads = jnp.zeros((N, T, U, V), grads_g.dtype)
    blank_idx = jnp.broadcast_to(
        jnp.full((N, 1, U, 1), blank, jnp.int32), (N, T, U, 1)
    )
    label_idx = jnp.broadcast_to(labels_ext[:, None, :, None], (N, T, U, 1))
    grads = grads.at[
        jnp.arange(N)[:, None, None],
        jnp.arange(T)[None, :, None],
        jnp.arange(U)[None, None, :],
        blank_idx[..., 0],
    ].add(grads_g[..., 0])
    grads = grads.at[
        jnp.arange(N)[:, None, None],
        jnp.arange(T)[None, :, None],
        jnp.arange(U)[None, None, :],
        label_idx[..., 0],
    ].add(grads_g[..., 1])
    if return_mismatch:
        bad = mismatch_mask(xs_gathered[..., 0], alphas, betas, xn, yn)
        return costs, grads, alphas, betas, bad
    return costs, grads, alphas, betas
