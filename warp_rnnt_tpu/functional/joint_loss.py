"""Auto-routed joint-network + RNN-T loss (the layout dispatcher).

The reference exposes three lattice layouts (padded / gathered / compact)
and leaves choosing to the user; on its GPU benchmark compact simply always
wins (`/root/reference/pytorch_binding/benchmark2.py:129-164`).  On TPU the
winner depends on the shape regime (measured, benchmarks_endtoend.json
`joint_loss_backward_by_config`):

  * the fused joint+loss Pallas kernel (`ops/fused_joint.py`) wins once
    the logits tensor the padded pipeline would materialize is large (its
    HBM round-trips dominate): 2.9 ms vs 15.6 from-logits vs 5.0 compact
    at N=16, T=150, U=20, V=5000, H=256 — and a ~190x program-HBM drop;
  * below that (tiny-V, lattice-bound steps) padded from-logits wins
    (0.38 ms vs fused 0.52 at T=150, U=40, V=28 — the kernel pads V to 128
    lanes and recomputes the tanh in fp32);
  * compact (packed) sits between them when V dominates the padded tensor,
    and loses badly at tiny-V/huge-lattice shapes where per-row packed
    indexing dominates the step.

`rnnt_loss_joint(layout="auto")` makes the choice so the user never has to
know — the reference-parity promise ("compact never loses") delivered the
TPU way: by routing to the measured winner.

Every layout computes the SAME mathematical function (the Tanh-MLP joint of
`models/joint.Joint` with identical parameters, bf16 MXU matmuls with fp32
accumulation) — layout is purely an execution strategy.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from warp_rnnt_tpu.functional.from_logits import rnnt_loss_from_logits
from warp_rnnt_tpu.functional.loss import rnnt_loss


# Auto-route boundary: the fused kernel wins once the materialized logits
# tensor is large enough that its HBM round-trips dominate the step; below
# it the step is lattice-DP/latency-bound and the kernel's V->128 padding
# and fp32 tanh recompute cost more than they save.  Measured
# (benchmarks_endtoend.json joint_loss_backward_by_config, N=16, H=256):
# at 11 MB logits (T=150,U=40,V=28) from-logits 0.38 ms beats fused 0.52;
# at 252 MB (T=150,U=20,V=5000) fused 2.90 beats 15.6; the boundary is
# placed at the geometric middle of the measured bracket.
_FUSED_LOGITS_BYTES = 48 << 20


def joint_layout_route(T: int, U: int, H: int, V: int, N: int = 1) -> str:
    """The measured routing policy for `layout="auto"`.

    On TPU: "fused" once the logits tensor the padded pipeline would
    materialize exceeds `_FUSED_LOGITS_BYTES` (where avoiding it pays),
    else "padded" (from-logits).  Off TPU always "padded" — the fused
    kernel would run under the Pallas interpreter.  U counts lattice rows
    (labels + 1).
    """
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        on_tpu = False
    if not on_tpu:
        return "padded"
    logits_bytes = 4 * N * T * U * V
    return "fused" if logits_bytes >= _FUSED_LOGITS_BYTES else "padded"


def _pre_projections(f, g, params, mode):
    """Shared pre-projection math (identical to ops/fused_joint.py): the
    joint is tanh((f @ Wa + b_pre) + g @ Wc) @ w_out + b_out."""
    w_pre, b_pre = params["w_pre"], params["b_pre"]
    F = f.shape[-1]
    cd = jnp.bfloat16
    if mode == "add":
        wa = wc = w_pre.astype(cd)
    elif mode == "concat":
        wa, wc = w_pre[:F].astype(cd), w_pre[F:].astype(cd)
    else:
        raise ValueError(f"unknown joint mode: {mode!r}")
    a = (
        jnp.dot(f.astype(cd), wa, preferred_element_type=jnp.float32)
        + b_pre.astype(jnp.float32)
    )
    c = jnp.dot(g.astype(cd), wc, preferred_element_type=jnp.float32)
    return a, c


def _project_out(a, c, params, combine):
    """logits = tanh(combine(a, c)) @ w_out + b_out, bf16 MXU / fp32 accum.

    ``combine`` builds the per-cell hidden tensor from the two small
    pre-projections (broadcast add for the padded layout, row gathers for
    the compact one).  The whole combine -> tanh -> project chain is
    rematerialized in the backward (`jax.checkpoint` over a function of
    only a and c): the tanh stays fp32 (same numerics as the fused
    kernel's in-VMEM fp32 tanh) but autodiff's residuals shrink from the
    fp32 (N, T, U, H) tanh output — a full extra HBM round-trip of the
    largest tensor in the step, measured +1.0 ms at T=150, U=40, H=256,
    N=16 where the whole step is 0.4 ms — to just a and c; the backward
    re-derives the bf16 matmul operand from them (the logits matmul
    itself is dead code in the rematerialized graph and DCE'd)."""
    w_out, b_out = params["w_out"], params["b_out"]

    @jax.checkpoint
    def project(a, c):
        h = combine(a, c)
        z = jax.lax.dot_general(
            jnp.tanh(h).astype(jnp.bfloat16).reshape(-1, h.shape[-1]),
            w_out.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(h.shape[:-1] + (w_out.shape[1],))
        return z + b_out.astype(jnp.float32)

    return project(a, c)


def pack_joint_metadata(frames_lengths, labels_lengths):
    """Host-side packing indices for the compact layout.

    Returns (n_idx, t_idx, u_idx) int32 arrays of length
    STU = sum(xn * (yn+1)) mapping each packed row to its (sample, frame,
    label-row) coordinate — shape-defining, so lengths must be concrete
    (not traced).  Mirrors the reference's memPref construction
    (`pytorch_binding/binding.cpp:141-158`)."""
    xn = np.asarray(frames_lengths)
    yn = np.asarray(labels_lengths)
    n_idx = np.concatenate([
        np.full(int(t) * (int(u) + 1), i, np.int32)
        for i, (t, u) in enumerate(zip(xn, yn))
    ] or [np.zeros(0, np.int32)])
    t_idx = np.concatenate([
        np.repeat(np.arange(int(t), dtype=np.int32), int(u) + 1)
        for t, u in zip(xn, yn)
    ] or [np.zeros(0, np.int32)])
    u_idx = np.concatenate([
        np.tile(np.arange(int(u) + 1, dtype=np.int32), int(t))
        for t, u in zip(xn, yn)
    ] or [np.zeros(0, np.int32)])
    return jnp.asarray(n_idx), jnp.asarray(t_idx), jnp.asarray(u_idx)


def rnnt_loss_joint(
    f,
    g,
    params: dict,
    labels,
    frames_lengths,
    labels_lengths,
    average_frames: bool = False,
    reduction: Optional[str] = None,
    blank: int = 0,
    fastemit_lambda: float = 0.0,
    mode: str = "add",
    layout: str = "auto",
    impl: str = "auto",
):
    """Joint network + RNN-T loss with automatic layout routing.

    f (N, T, F) encoder outputs, g (N, U, F') predictor outputs,
    ``params = dict(w_pre, b_pre, w_out, b_out)`` (the Tanh-MLP joint of
    `models/joint.Joint`; "concat" mode splits w_pre into row blocks).
    Differentiable w.r.t. f, g and all four parameters in every layout.

    layout:
      * "auto"    — the measured winner for this shape/backend
                    (`joint_layout_route`);
      * "fused"   — fused joint+loss Pallas kernel, logits never in HBM;
      * "padded"  — materialized logits + fused from-logits loss;
      * "compact" — packed (STU, V) pipeline: only the sum(xn*(yn+1)) valid
                    cells are computed.  Packing indices are shape-defining,
                    so the lengths must be CONCRETE (host) values — not
                    usable under jit with traced lengths.
    """
    if layout == "auto":
        layout = joint_layout_route(
            f.shape[1], g.shape[1], params["w_out"].shape[0],
            params["w_out"].shape[1], N=f.shape[0],
        )
    if layout == "fused":
        from warp_rnnt_tpu.ops.fused_joint import rnnt_loss_fused_joint

        return rnnt_loss_fused_joint(
            f, g, params, labels, frames_lengths, labels_lengths,
            average_frames=average_frames, reduction=reduction, blank=blank,
            fastemit_lambda=fastemit_lambda, impl=impl, mode=mode,
        )
    a, c = _pre_projections(f, g, params, mode)
    if layout == "padded":
        logits = _project_out(
            a, c, params, lambda a, c: a[:, :, None, :] + c[:, None, :, :]
        )
        return rnnt_loss_from_logits(
            logits, labels, frames_lengths, labels_lengths,
            average_frames=average_frames, reduction=reduction, blank=blank,
            fastemit_lambda=fastemit_lambda, impl=impl,
        )
    if layout == "compact":
        n_idx, t_idx, u_idx = pack_joint_metadata(
            frames_lengths, labels_lengths
        )
        yn_h = np.asarray(labels_lengths)
        ys_packed = jnp.concatenate([
            jnp.asarray(labels)[i, : int(yn_h[i])]
            for i in range(len(yn_h))
        ] or [jnp.zeros(0, jnp.int32)])
        rows = _project_out(
            a, c, params, lambda a, c: a[n_idx, t_idx] + c[n_idx, u_idx]
        )
        log_probs = jax.nn.log_softmax(rows, axis=-1)
        T = int(np.asarray(frames_lengths).max())
        U = int(yn_h.max())
        return rnnt_loss(
            log_probs, ys_packed, frames_lengths, labels_lengths,
            average_frames=average_frames, reduction=reduction, blank=blank,
            fastemit_lambda=fastemit_lambda, compact=True, impl=impl,
            max_frames=T, max_labels=U,
        )
    raise ValueError(
        f"unknown layout: {layout!r}, expected one of"
        " ['auto', 'fused', 'padded', 'compact']"
    )
