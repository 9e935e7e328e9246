"""PyTorch front-end for the TPU-native RNN-T loss.

Drop-in surface for users of the reference `warp_rnnt.rnnt_loss`
(`pytorch_binding/warp_rnnt/__init__.py:57-143`): identical signature,
options, error messages for the validated properties, and autograd contract
(gradients computed during forward, backward is an elementwise multiply).

The compute crosses into JAX: tensors move host<->device via numpy (torch in
this environment is CPU-only; on a TPU VM the loss math itself runs on the
chip).  For pure-JAX training pipelines prefer `warp_rnnt_tpu.rnnt_loss` —
this shim exists so reference users can switch frameworks incrementally.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import torch

import jax.numpy as jnp

from warp_rnnt_tpu.functional.core import rnnt_core_with_internals
from warp_rnnt_tpu.functional.loss import _gather_blank_emit


def _validate(xs, ys, xn, yn, compact):
    if not xs.is_contiguous():
        raise RuntimeError("xs must be contiguous")
    if compact:
        if xs.dim() != 2:
            raise RuntimeError("xs must have 2 dimensions")
    elif xs.dim() != 4:
        raise RuntimeError("xs must have 4 dimensions")
    if xs.dtype != torch.float32:
        raise RuntimeError("xs must be a Float tensor")
    if ys.dtype != torch.int32:
        raise RuntimeError("ys must be a Int tensor")
    if xn.dtype != torch.int32:
        raise RuntimeError("xn must be a Int tensor")
    if yn.dtype != torch.int32:
        raise RuntimeError("yn must be a Int tensor")
    if not compact and xs.size(2) != ys.size(1) + 1:
        raise RuntimeError("ys shape (N, U-1) mismatched with xs (N, T, U, V)")


class RNNTLoss(torch.autograd.Function):
    """Padded-layout autograd op (mirrors reference `RNNTLoss`)."""

    @staticmethod
    def forward(ctx, log_probs, labels, frames_lengths, labels_lengths,
                blank=0, fastemit_lambda=0.0):
        xs = jnp.asarray(log_probs.detach().numpy())
        ys = jnp.asarray(labels.detach().numpy().astype(np.int32))
        xn = jnp.asarray(frames_lengths.detach().numpy().astype(np.int32))
        yn = jnp.asarray(labels_lengths.detach().numpy().astype(np.int32))

        if blank == -1:
            gathered = xs
        else:
            gathered = _gather_blank_emit(xs, ys, blank)
        costs, grads_g, _, _ = rnnt_core_with_internals(
            gathered, xn, yn, fastemit_lambda
        )
        if blank == -1:
            grads = torch.from_numpy(np.asarray(grads_g))
        else:
            # scatter 2-wide grads to (N, T, U, V), zeros elsewhere
            N, T, U, V = log_probs.shape
            g = np.asarray(grads_g)
            out = np.zeros((N, T, U, V), np.float32)
            labels_np = labels.detach().numpy().astype(np.int64)
            n_i = np.arange(N)[:, None, None]
            t_i = np.arange(T)[None, :, None]
            u_i = np.arange(U)[None, None, :]
            loc = np.concatenate(
                [labels_np, np.full((N, 1), blank, np.int64)], axis=1
            )[:, None, :].repeat(T, axis=1)
            np.add.at(out, (n_i, t_i, u_i, np.broadcast_to(blank, (N, T, U))), g[..., 0])
            np.add.at(out, (n_i, t_i, u_i, loc), g[..., 1])
            grads = torch.from_numpy(out)
        ctx.grads = grads
        return torch.from_numpy(np.asarray(costs))

    @staticmethod
    def backward(ctx, grads_output):
        grads_output = grads_output.view(-1, 1, 1, 1).to(ctx.grads)
        return ctx.grads.mul_(grads_output), None, None, None, None, None


def rnnt_loss(
    log_probs: torch.Tensor,
    labels: torch.Tensor,
    frames_lengths: torch.Tensor,
    labels_lengths: torch.Tensor,
    average_frames: bool = False,
    reduction: Optional[str] = "none",
    blank: int = 0,
    gather: bool = False,
    fastemit_lambda: float = 0.0,
    compact: bool = False,
) -> torch.Tensor:
    """The RNN-Transducer loss (torch front-end; see module docstring)."""
    assert average_frames is None or isinstance(average_frames, bool)
    assert reduction is None or reduction in ("none", "mean", "sum")
    assert isinstance(blank, int)
    assert isinstance(gather, bool)

    # reference `pytorch_binding/warp_rnnt/__init__.py:105-107`
    assert not labels.requires_grad, "labels does not require gradients"
    assert not frames_lengths.requires_grad, "frames_lengths does not require gradients"
    assert not labels_lengths.requires_grad, "labels_lengths does not require gradients"

    _validate(log_probs, labels, frames_lengths, labels_lengths, compact)

    if compact:
        costs = _RNNTLossCompact.apply(
            log_probs, labels, frames_lengths, labels_lengths,
            blank, fastemit_lambda,
            # inference fast path: beta-only sweep, no alphas/grads — mirrors
            # `__init__.py:115` + `core_compact.cu:371-378`
            log_probs.requires_grad and torch.is_grad_enabled(),
        )
    else:
        if gather and blank != -1:
            N, T, U, V = log_probs.size()
            index = torch.full(
                [N, T, U, 2], blank, device=labels.device, dtype=torch.long
            )
            index[:, :, : U - 1, 1] = labels.unsqueeze(dim=1)
            log_probs = log_probs.gather(dim=3, index=index)
            blank = -1
        costs = RNNTLoss.apply(
            log_probs, labels, frames_lengths, labels_lengths,
            blank, fastemit_lambda,
        )

    if average_frames:
        costs = costs / frames_lengths.to(costs)
    if reduction in (None, "none"):
        return costs
    if reduction == "sum":
        return costs.sum()
    if reduction == "mean":
        return costs.mean()
    raise ValueError(
        f"Unknown reduction method: {reduction}, expected to be one of"
        " ['mean', 'sum', 'none']"
    )


class _RNNTLossFusedJoint(torch.autograd.Function):
    """Fused joint+loss autograd op (beyond-reference capability).

    Unlike the padded/compact ops, the parameter gradients (d_w, d_b) are
    batch-summed — not per-sample separable — so the reference's
    grads-in-forward + multiply-in-backward contract cannot apply.  The
    backward instead calls the JAX VJP with the true upstream cotangent
    (residuals held by the vjp closure on ctx).
    """

    @staticmethod
    def forward(ctx, f, g, w_pre, b_pre, w_out, b_out, labels,
                frames_lengths, labels_lengths, blank, fastemit_lambda, mode,
                layout="fused"):
        import jax

        from warp_rnnt_tpu.functional.joint_loss import (
            rnnt_loss_joint as _jax_joint,
        )

        to_j = lambda t: jnp.asarray(t.detach().numpy())
        labels_j = jnp.asarray(labels.detach().numpy().astype(np.int32))
        xn = jnp.asarray(frames_lengths.detach().numpy().astype(np.int32))
        yn = jnp.asarray(labels_lengths.detach().numpy().astype(np.int32))

        def fn(f_j, g_j, w_pre_j, b_pre_j, w_out_j, b_out_j):
            params = dict(w_pre=w_pre_j, b_pre=b_pre_j,
                          w_out=w_out_j, b_out=b_out_j)
            return _jax_joint(
                f_j, g_j, params, labels_j, xn, yn,
                reduction="none", blank=blank,
                fastemit_lambda=fastemit_lambda, mode=mode, layout=layout,
            )

        costs, vjp_fn = jax.vjp(
            fn, to_j(f), to_j(g), to_j(w_pre), to_j(b_pre),
            to_j(w_out), to_j(b_out),
        )
        ctx.vjp_fn = vjp_fn
        return torch.from_numpy(np.asarray(costs))

    @staticmethod
    def backward(ctx, grads_output):
        ct = jnp.asarray(grads_output.detach().numpy().astype(np.float32))
        grads = ctx.vjp_fn(ct)
        out = tuple(torch.from_numpy(np.asarray(gr, np.float32)) for gr in grads)
        return out + (None, None, None, None, None, None, None)


def rnnt_loss_fused_joint(
    f: torch.Tensor,
    g: torch.Tensor,
    params: dict,
    labels: torch.Tensor,
    frames_lengths: torch.Tensor,
    labels_lengths: torch.Tensor,
    average_frames: bool = False,
    reduction: Optional[str] = "none",
    blank: int = 0,
    fastemit_lambda: float = 0.0,
    mode: str = "add",
) -> torch.Tensor:
    """Fused joint-projection + RNN-T loss for torch users.

    f (N, T, F) encoder outputs, g (N, U, F') predictor outputs,
    ``params = dict(w_pre, b_pre, w_out, b_out)`` — the Tanh-MLP joint's
    weights as torch tensors.  The (N, T, U, V) logits tensor is never
    materialized in either direction (see `warp_rnnt_tpu.ops.fused_joint`);
    the reference architecture cannot offer this — it requires materialized
    log-probs (`README.md:59`).  Gradients flow to f, g, and all four
    parameter tensors.
    """
    assert reduction is None or reduction in ("none", "mean", "sum")
    assert not labels.requires_grad, "labels does not require gradients"
    assert not frames_lengths.requires_grad, "frames_lengths does not require gradients"
    assert not labels_lengths.requires_grad, "labels_lengths does not require gradients"

    costs = _RNNTLossFusedJoint.apply(
        f, g, params["w_pre"], params["b_pre"], params["w_out"],
        params["b_out"], labels, frames_lengths, labels_lengths,
        blank, fastemit_lambda, mode, "fused",
    )
    if average_frames:
        costs = costs / frames_lengths.to(costs)
    if reduction in (None, "none"):
        return costs
    if reduction == "sum":
        return costs.sum()
    if reduction == "mean":
        return costs.mean()
    raise ValueError(
        f"Unknown reduction method: {reduction}, expected to be one of"
        " ['mean', 'sum', 'none']"
    )


def rnnt_loss_joint(
    f: torch.Tensor,
    g: torch.Tensor,
    params: dict,
    labels: torch.Tensor,
    frames_lengths: torch.Tensor,
    labels_lengths: torch.Tensor,
    average_frames: bool = False,
    reduction: Optional[str] = "none",
    blank: int = 0,
    fastemit_lambda: float = 0.0,
    mode: str = "add",
    layout: str = "auto",
) -> torch.Tensor:
    """Auto-routed joint + RNN-T loss for torch users.

    Same contract as `rnnt_loss_fused_joint` but the execution layout
    ('fused' | 'padded' | 'compact') is picked by the measured routing
    policy when ``layout="auto"`` (`functional/joint_loss.py`) — the torch
    user never has to know which lattice layout is fast on the backend.
    """
    assert reduction is None or reduction in ("none", "mean", "sum")
    costs = _RNNTLossFusedJoint.apply(
        f, g, params["w_pre"], params["b_pre"], params["w_out"],
        params["b_out"], labels, frames_lengths, labels_lengths,
        blank, fastemit_lambda, mode, layout,
    )
    if average_frames:
        costs = costs / frames_lengths.to(costs)
    if reduction in (None, "none"):
        return costs
    if reduction == "sum":
        return costs.sum()
    return costs.mean()


class _RNNTLossCompact(torch.autograd.Function):
    @staticmethod
    def forward(ctx, log_probs, labels, frames_lengths, labels_lengths,
                blank=0, fastemit_lambda=0.0, requires_grad=True):
        xs = jnp.asarray(log_probs.detach().numpy())
        ys = jnp.asarray(labels.detach().numpy().astype(np.int32))
        xn = frames_lengths.detach().numpy().astype(np.int32)
        yn = labels_lengths.detach().numpy().astype(np.int32)

        if not requires_grad:
            # beta-only inference sweep: `rnnt_loss_compact_costs` called as
            # a primal (outside jax.grad) runs the custom_vjp's undifferen-
            # tiated path — one backward sweep, no alphas, no grads
            # (reference `core_compact.cu:371-378`, `binding.cpp:186-195`).
            from warp_rnnt_tpu.functional.compact import rnnt_loss_compact_costs

            costs = rnnt_loss_compact_costs(
                xs, ys, xn, yn, blank=blank, fastemit_lambda=fastemit_lambda,
                max_frames=int(xn.max()), max_labels=int(yn.max()),
            )
            ctx.grads = None
            return torch.from_numpy(np.asarray(costs))

        from warp_rnnt_tpu.functional.compact import (
            rnnt_loss_compact_with_internals,
        )

        costs, grads, _ = rnnt_loss_compact_with_internals(
            xs, ys, xn, yn, blank=blank, fastemit_lambda=fastemit_lambda,
            max_frames=int(xn.max()), max_labels=int(yn.max()),
        )
        ctx.grads = torch.from_numpy(np.asarray(grads))
        ctx.cumlen = torch.from_numpy(
            np.cumsum(xn * (yn + 1)).astype(np.int64)
        )
        return torch.from_numpy(np.asarray(costs))

    @staticmethod
    def backward(ctx, grads_output):
        # expand per-sample upstream cost grads to packed rows
        starts = torch.cat([torch.zeros(1, dtype=torch.int64), ctx.cumlen[:-1]])
        per_row = torch.repeat_interleave(grads_output, ctx.cumlen - starts)
        return (
            ctx.grads.mul_(per_row.view(-1, 1).to(ctx.grads)),
            None, None, None, None, None, None,
        )
