"""Compact (packed, padding-free) RNN-T loss layout.

Reference contract (`pytorch_binding/binding.cpp:109-247`,
`core_compact.cu`): log-probs arrive packed as ``xs (STU, V)`` with
``STU = sum_i xn[i] * (yn[i]+1)`` (each sample's (T_i, U_i+1) lattice
flattened row-major and concatenated) and labels packed as ``ys (sum(yn),)``;
per-sample costs come back along with gradients in the same packed layout.

TPU-first design: instead of per-sample CUDA kernels with offset arrays and a
binary-search scatter kernel (`core_compact.cu:456-484`), the packed tensor
is (a) gathered down to the 2-wide blank/label lattice *in packed form*
(mirroring `kernel_fill_gather`, `core_compact.cu:403-436`), (b) scattered
into a dense padded (N, T, U, 2) block — dense tiles are what the VPU wants —
and (c) run through the same `rnnt_core`.  Both directions of the packed <->
padded reshape are expressed as GATHERS (the padded->packed inverse is a
hand-written custom_vjp — XLA's autodiff scatter-add lowers serially at
scale), so `jax.grad` produces the packed (STU, V) gradient with no scatter
anywhere on the hot path, including the reference's behavior of
accumulating the blank+label collision on terminal rows where `loc == blank`.

Shapes under jit must be static: `STU` comes from ``xs.shape`` and the dense
bounds T = max(xn), U = max(yn)+1 must be supplied via ``max_frames`` /
``max_labels`` when lengths are traced (outside jit they are derived).

Cost model (measured on v5e): the packed<->padded movement is auto-routed
per vocabulary regime (`_use_movement_kernel`).  Small V (compare-mask
regime, V*itemsize <= ~12 KiB): Pallas offset-DMA kernels
(`ops/packed_kernels.py`), 2.6-3.7x over the XLA composition (loss+grad on
packed input: 0.39 ms at T=150,U=40,V=28; 63.7 ms at T=1500,U=300,V=50).
Large V: XLA take_along_axis moves rows at a flat ~15-30 ns/row and wins
(1.6 ms at V=5000).  End-to-end, compact is ~3.5x faster AND lighter than
padded at V=5000 (the vocabulary dominates); at tiny-V/huge-lattice shapes
the CALLER's packed-joint row construction (f/g gathers over STU rows)
still dominates the step and padded remains faster overall.  Users should
not pick layouts by hand: `functional/joint_loss.rnnt_loss_joint(
layout="auto")` routes the whole joint+loss pipeline to the measured
winner per shape (on TPU: the fused kernel at large logits volumes, padded
from-logits below — both beat compact at every measured shape,
benchmarks_endtoend.json).  This module remains the reference-parity
packed API for callers that hold packed (STU, V) tensors.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from warp_rnnt_tpu.functional.core import rnnt_core, rnnt_core_with_internals
from warp_rnnt_tpu.functional.gather import gather_blank_label

# Packed-movement backend for the differentiable path: None = auto (Pallas
# offset-DMA kernels on TPU in the small-V regime, XLA composition
# elsewhere); tests force it.
_FORCE_KERNEL: Optional[bool] = None


def _use_movement_kernel(V: int, dtype=jnp.float32) -> bool:
    """The kernel wins exactly where XLA's movement lowering is the slow
    gather/iota-select class — the compare-mask regime (V*itemsize under
    the ~12 KiB crossover).  Above it, XLA's take_along_axis runs the
    movement at a flat ~15-30 ns/row and the kernel's full-row window
    reads lose (isolated loss+grad on packed input, v5e:
    V=28: 0.39 ms kernel vs 1.45 XLA; V=50 @ T=1500,U=300: 63.7 vs 166.3;
    V=5000: 11.6 kernel vs 1.6 XLA — scripts/exp_movement_isolation.py)."""
    if _FORCE_KERNEL is not None:
        return _FORCE_KERNEL
    from warp_rnnt_tpu.functional.gather import _use_mask

    if not _use_mask(V, dtype):
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _static_bounds(xn, yn, max_frames, max_labels):
    if max_frames is None:
        try:
            max_frames = int(jnp.max(xn))
        except jax.errors.ConcretizationTypeError as e:
            raise ValueError(
                "compact mode under jit requires static max_frames"
            ) from e
    if max_labels is None:
        try:
            max_labels = int(jnp.max(yn))
        except jax.errors.ConcretizationTypeError as e:
            raise ValueError(
                "compact mode under jit requires static max_labels"
            ) from e
    return max_frames, max_labels


def _row_coordinates(stu, xn, yn):
    """Map packed row id -> (sample n, frame t, label row u).

    Replaces the reference's device binary search over cum_lens
    (`core_compact.cu:465-471`) with one vectorized searchsorted.
    """
    sizes = xn * (yn + 1)
    cumlen = jnp.cumsum(sizes)
    mem_pref = cumlen - sizes  # exclusive prefix
    rows = jnp.arange(stu, dtype=jnp.int32)
    n = jnp.searchsorted(cumlen, rows, side="right").astype(jnp.int32)
    n = jnp.minimum(n, xn.shape[0] - 1)
    within = rows - mem_pref[n]
    u_stride = yn[n] + 1
    t = within // u_stride
    u = within - t * u_stride
    return n, t, u, mem_pref, cumlen


def compact_gather(xs, ys, xn, yn, blank: int = 0):
    """Packed (STU, V) -> packed 2-wide lattice (STU, 2) plus `loc`.

    `loc[r]` is the vocabulary index gathered into channel 1 at row r (the
    next label, or blank on each sample's final row) — identical semantics to
    the reference `loc` output used by the backward scatter.
    """
    stu = xs.shape[0]
    n, t, u, _, _ = _row_coordinates(stu, xn, yn)
    label_pref = jnp.cumsum(yn) - yn
    lab_pos = jnp.clip(label_pref[n] + u, 0, max(int(ys.shape[0]) - 1, 0))
    if ys.shape[0] == 0:
        next_label = jnp.full((stu,), blank, jnp.int32)
    else:
        next_label = ys.astype(jnp.int32)[lab_pos]
    loc = jnp.where(u < yn[n], next_label, blank).astype(jnp.int32)
    return gather_blank_label(xs, loc, blank), loc


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def compact_to_padded(xs_gathered_compact, xn, yn, T: int, U: int):
    """Unpack packed (STU, 2) rows into a dense (N, T, U, 2) block.

    Invalid cells are filled with 0.0 (rnnt_core masks them by length).

    The VJP is hand-written as the inverse GATHER by row coordinates:
    autodiffing the forward fancy-index emits an XLA scatter-add, which
    falls into a serial lowering at scale (measured 12.7 s/step at 4M
    packed rows, T=1500/U=300 — vs 46 ms for the whole padded pipeline).
    The packed->padded map is bijective on valid cells, so the cotangent of
    row r is exactly ct_padded[n(r), t(r), u(r)] — a gather, the fast
    direction on TPU.
    """
    # (a per-(n,t) slab formulation via vmapped dynamic_slice was measured
    # and rejected: it regresses the short-T configs ~1.7x and wins only
    # ~10% at T=1500)
    N = xn.shape[0]
    sizes = xn * (yn + 1)
    mem_pref = jnp.cumsum(sizes) - sizes
    t_iota = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    u_iota = jnp.arange(U, dtype=jnp.int32)[None, None, :]
    pos = mem_pref[:, None, None] + t_iota * (yn[:, None, None] + 1) + u_iota
    valid = (t_iota < xn[:, None, None]) & (u_iota <= yn[:, None, None])
    pos = jnp.where(valid, pos, 0)
    padded = xs_gathered_compact[pos]  # (N, T, U, 2)
    return jnp.where(valid[..., None], padded, 0.0)


def _c2p_fwd(xs_gathered_compact, xn, yn, T, U):
    out = compact_to_padded(xs_gathered_compact, xn, yn, T, U)
    return out, (xn, yn, xs_gathered_compact.shape[0])


def _c2p_bwd(T, U, res, ct):
    xn, yn, stu = res
    n, t, u, _, cumlen = _row_coordinates(stu, xn, yn)
    # Rows past sum(xn*(yn+1)) (a padded/bucketed packed buffer) have no
    # coordinate: _row_coordinates clamps them onto the last sample, and the
    # clamped gather would alias them onto real cells' gradients.  They must
    # come back as exact zeros (the forward never reads them).
    valid = (jnp.arange(stu, dtype=jnp.int32) < cumlen[-1])[:, None]
    return jnp.where(valid, ct[n, t, u], 0.0), None, None


compact_to_padded.defvjp(_c2p_fwd, _c2p_bwd)


def rnnt_loss_compact_costs(
    xs,
    ys,
    xn,
    yn,
    blank: int = 0,
    fastemit_lambda: float = 0.0,
    impl: str = "auto",
    max_frames: Optional[int] = None,
    max_labels: Optional[int] = None,
):
    """Differentiable per-sample costs for the packed layout."""
    if xs.ndim != 2:
        raise ValueError("compact log_probs must have 2 dimensions (STU, V)")
    if ys.ndim != 1:
        raise ValueError("compact labels must have 1 dimension (sum(yn),)")
    T, max_y = _static_bounds(xn, yn, max_frames, max_labels)
    U = max_y + 1
    from warp_rnnt_tpu.ops.packed_kernels import movement_kernel_supported

    if (
        _use_movement_kernel(xs.shape[1])
        and movement_kernel_supported(T, U, xs.shape[1])
    ):
        # Pallas offset-DMA movement: one kernel pass per direction instead
        # of XLA's ~26 GB/s gather/iota-select fusions (2.6-3.7x measured
        # loss+grad at the small-V reference shapes — see
        # ops/packed_kernels.py and scripts/exp_movement_isolation.py)
        from warp_rnnt_tpu.ops.packed_kernels import _loc_rows, packed_lattice

        loc_rows = _loc_rows(ys, xn, yn, U, blank)
        padded = packed_lattice(
            xs.astype(jnp.float32), loc_rows, xn, yn, blank, T, U
        )
    else:
        gathered, _ = compact_gather(xs.astype(jnp.float32), ys, xn, yn, blank)
        padded = compact_to_padded(gathered, xn, yn, T, U)
    return rnnt_core(padded, xn, yn, fastemit_lambda, impl)


def rnnt_loss_compact_with_internals(
    xs, ys, xn, yn,
    blank: int = 0, fastemit_lambda: float = 0.0, impl: str = "auto",
    max_frames: Optional[int] = None, max_labels: Optional[int] = None,
):
    """Conformance entry: returns (costs, packed (STU, V) grads, loc).

    Equivalent to reference `rnnt_loss_compact` forward followed by
    `rnnt_loss_compact_backward` with unit upstream gradients.
    """
    T, max_y = _static_bounds(xn, yn, max_frames, max_labels)
    U = max_y + 1
    stu, V = xs.shape
    gathered, loc = compact_gather(xs.astype(jnp.float32), ys, xn, yn, blank)
    padded = compact_to_padded(gathered, xn, yn, T, U)
    costs, grads_padded, _, _ = rnnt_core_with_internals(
        padded, xn, yn, fastemit_lambda, impl
    )
    # padded (N,T,U,2) -> packed (STU, 2): inverse of compact_to_padded.
    # Pad rows (STU beyond sum(xn*(yn+1))) are masked to zero — the clamped
    # gather would otherwise alias them onto the last sample's cells.
    n, t, u, _, cumlen = _row_coordinates(stu, xn, yn)
    valid_row = (jnp.arange(stu, dtype=jnp.int32) < cumlen[-1])[:, None]
    grads_packed2 = jnp.where(valid_row, grads_padded[n, t, u], 0.0)  # (STU, 2)
    # packed 2-wide -> packed (STU, V): blank + loc scatter-add (collision on
    # terminal rows where loc == blank accumulates, matching the reference
    # scatter kernel's two writes of which the label one is zero there).
    rows = jnp.arange(stu)
    grads = jnp.zeros((stu, V), jnp.float32)
    grads = grads.at[rows, blank].add(grads_packed2[:, 0])
    grads = grads.at[rows, loc].add(grads_packed2[:, 1])
    return costs, grads, loc
