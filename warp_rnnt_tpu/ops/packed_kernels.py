"""Pallas kernels for the compact (packed) layout's data movement.

The reference's compact CUDA kernels (`core_compact.cu:403-484`) index packed
rows directly — per-thread offset arithmetic is free on a GPU.  The XLA
equivalents are not free on TPU at small vocabularies: every formulation of
the ragged packed<->padded movement lowers to a gather/iota-select class
that runs at ~26-28 GB/s (measured, scripts/exp_compact_micro.py):

    compact_gather fwd (mask over (STU,V))      31.7 ms
    per-cell unpack (STU,2)->(N,T,U,2)          37.9 ms
    per-row inverse (N,T,U,2)->(STU,2)          40.5 ms   (the VJP)
    frame-slab lax.gather (24K indices)         34-52 ms

These two kernels replace the whole movement with scalar-prefetched offset
arithmetic + contiguous DMA — the TPU equivalent of the reference's
`cum_lens` binary search:

  * `packed_gather_padded`: packed (STU, V) -> blank/emit columns (N, T, U)
    in one pass.  Per (n, t-tile) grid step, one contiguous DMA pulls the
    sample's BT*(yn+1) packed rows into VMEM (packed rows of one sample are
    consecutive); the blank/label columns are extracted on the VPU in
    window coordinates, and only those 2-wide columns are permuted to the
    padded (BT, U) layout.
  * `packed_scatter_grads`: the exact inverse for the backward pass — the
    dense two-nonzero gradient rows are composed directly in the packed
    window layout in VMEM and DMA'd back at the sample's offsets.
    Overlapping tail writes (the U-vs-(yn+1) stride mismatch) are resolved
    by ascending write order: each frame/tile overwrites its predecessor's
    overrun, and the 8-row-aligned store head is read-modify-written.

The ragged<->padded permutation itself never touches the V-wide rows, and
its cost is LINEAR in the window size: each window row j's padded
coordinates (t_j, u_j) are recovered by an exact float floor-division by
the dynamic stride (VPU has no integer divide; one ±1 correction step makes
it exact), and the permutation is applied through two thin one-hot
factors — G (W, U) over u and tsel (W, BT) over t — as small MXU matmuls.
(A first formulation materialized the full (W, BT, U) one-hot; that is
QUADRATIC in BT*U and explodes at reference scale — 371 MB at U=301.)
No dynamic-offset vector load/store and no sublane<->lane relayout ever
reaches Mosaic — dynamic sublane slices at ragged strides are un-lowerable
("cannot statically prove that index in dimension 0 is a multiple of 8").
`loc` rides as a sublane-replicated (N, 8, U) block so it arrives
lane-oriented without a (U,1)->(1,U) relayout.

The vocab dim is padded to a 128 multiple when needed (Mosaic DMA requires
the copied minor extent be 128-lane aligned).  The gather kernel reads the
operand without ROW padding: the DMA window is clamped to the 8-row
tile-padded allocation (HBM buffers are (8,128)-tile padded, so a <8-row
overread past STU stays inside the allocation and the affected cells are
masked).  Only the scatter output carries explicit pad rows (its aligned
8-row store granularity needs writable slack).

Both kernels fall back to the XLA composition off-TPU (interpret mode is
used only in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 96 << 20


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _window_footprint(W: int, U: int, V: int, BT: int) -> int:
    """Scoped-VMEM bytes for one tile.  Beyond the (W, Vp) window slab, the
    coordinate/one-hot computation keeps ~4 lane-padded (W, U) f32-class
    temporaries live at once (G, the iota, the compare, the product) plus
    two (W, BT) factors — all padded to 128 lanes.  Measured: at BT=32,
    U=301, V=50 the compiler reports 69.4 MB, this model says 66.7 MB."""
    Vp = _round_up(V, 128)
    Up = _round_up(U, 128)
    return W * (Vp + 4 * Up + 2 * _round_up(BT, 128)) * 4


def _choose_bt(T: int, U: int, V: int):
    """Frames per grid step, or None when the kernel cannot run.

    VMEM must hold the (W, V) window slab plus the one-hot permutation
    factors and their lane-padded temporaries (`_window_footprint`);
    configs violating that at the smallest tile (huge U AND huge V) fall
    back to the XLA path."""
    budget = int(_VMEM_LIMIT * 0.42)
    if T < 8:
        W = T * U + 16
        return T if _window_footprint(W, U, V, T) <= budget else None
    for bt in (32, 24, 16, 8):
        W = _round_up(bt * U + 16, 8)
        if _window_footprint(W, U, V, bt) <= budget:
            return min(bt, _round_up(T, 8))
    return None


def movement_kernel_supported(T: int, U: int, V: int) -> bool:
    return _choose_bt(T, U, V) is not None


def _window_coords(shift, stride, W: int, BT: int, U: int):
    """Per-window-row padded coordinates and one-hot factors.

    Returns (G, tsel): G (W, U) f32 one-hot over u_j, tsel (W, BT) f32
    one-hot over t_j, both zero on rows outside this tile's frames.
    t_j = (j - shift) // stride by exact float floor-division (+-1
    corrected); u_j = (j - shift) - t_j * stride.
    """
    j_col = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    jrel = j_col - shift                                     # (W, 1)
    recip = 1.0 / stride.astype(jnp.float32)
    q = jnp.floor(jrel.astype(jnp.float32) * recip).astype(jnp.int32)
    r = jrel - q * stride
    q = q + (r >= stride).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    u_of = jrel - q * stride                                 # (W, 1)
    valid = (jrel >= 0) & (q >= 0) & (q < BT)
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (W, U), 1)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (W, BT), 1)
    G = ((u_iota == u_of) & valid).astype(jnp.float32)
    tsel = ((t_iota == q) & valid).astype(jnp.float32)
    return G, tsel


def _gather_kernel(starts_ref, yn_ref, xn_ref, loc_ref, xs_hbm,
                   blank_ref, emit_ref, buf, sem,
                   *, blank: int, BT: int, U: int, V: int, T: int, STU: int):
    n = pl.program_id(0)
    tt = pl.program_id(1)
    ynn = yn_ref[n]          # labels of sample n
    xnn = xn_ref[n]
    stride = ynn + 1         # packed rows per frame
    W = buf.shape[0]

    start = starts_ref[n * pl.num_programs(1) + tt]
    # 8-row-aligned DMA start, clamped so the static-size window stays
    # inside the 8-row tile-padded allocation; a larger-than-8 shift
    # happens only near/past the buffer end, where affected cells are
    # masked (dead tiles) or still covered (j = row - cl < W)
    cl_max = max(_round_up(STU, 8) - W, 0)
    cl = jnp.minimum((start // 8) * 8, cl_max)
    shift = start - cl

    copy = pltpu.make_async_copy(
        xs_hbm.at[pl.ds(pl.multiple_of(cl, 8), W), :], buf, sem
    )
    copy.start()
    copy.wait()

    G, tsel = _window_coords(shift, stride, W, BT, U)
    loc_lane = loc_ref[0][0:1, :]                     # (1, U) int32

    # per-window-row label column: loc_w[j] = loc[u_j] (ints are exact f32)
    loc_w = jnp.sum(G * loc_lane.astype(jnp.float32), axis=1, keepdims=True)
    win = buf[:]                                      # (W, V)
    v_iota = jax.lax.broadcasted_iota(jnp.int32, (W, V), 1)
    emit_w = jnp.sum(
        jnp.where(v_iota == loc_w.astype(jnp.int32), win, 0.0),
        axis=1, keepdims=True,
    )                                                 # (W, 1)
    blank_w = jnp.sum(
        jnp.where(v_iota == blank, win, 0.0), axis=1, keepdims=True
    )

    # permute the 2-wide columns (NOT the V-wide rows) to padded layout:
    # out[t, u] = sum_j tsel[j, t] * x_w[j] * G[j, u] — two thin matmuls
    # precision=HIGHEST: the MXU's default bf16 input rounding would
    # corrupt the carried values (one-hot selection must be exact)
    emit_p = jax.lax.dot_general(
        tsel * emit_w, G, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                 # (BT, U)
    blank_p = jax.lax.dot_general(
        tsel * blank_w, G, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    # mask cells outside the sample's lattice (garbage reads)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, U), 0) + tt * BT
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, U), 1)
    ok = (t_iota < xnn) & (u_iota <= ynn)
    blank_ref[0] = jnp.where(ok, blank_p, 0.0)
    emit_ref[0] = jnp.where(ok, emit_p, 0.0)


def _scatter_kernel(starts_ref, yn_ref, xn_ref, loc_ref, ct0_ref, ct1_ref,
                    zeros_hbm, out_hbm, buf, head, sem,
                    *, blank: int, BT: int, U: int, V: int, T: int, STU: int):
    n = pl.program_id(0)
    tt = pl.program_id(1)
    ynn = yn_ref[n]
    xnn = xn_ref[n]
    stride = ynn + 1
    WS = buf.shape[0]
    # clamp fully-invalid tiles (start beyond STU) into the pad region;
    # their payload is all-zero so the clamped write is harmless
    start = jnp.minimum(starts_ref[n * pl.num_programs(1) + tt], STU)
    # DMA writes are 8-row aligned: read-modify-write the aligned head so
    # rows [start8, start) — written by the PREVIOUS tile (grid order is
    # ascending packed offsets) — survive this tile's aligned store
    start8 = (start // 8) * 8
    d = start - start8
    hcopy = pltpu.make_async_copy(
        out_hbm.at[pl.ds(pl.multiple_of(start8, 8), 8), :], head, sem
    )
    hcopy.start()
    hcopy.wait()

    # masked cotangents for this tile, padded (BT, U) layout
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, U), 0) + tt * BT
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, U), 1)
    ok = (t_iota < xnn) & (u_iota <= ynn)
    ct0 = jnp.where(ok, ct0_ref[0], 0.0)              # (BT, U)
    ct1 = jnp.where(ok, ct1_ref[0], 0.0)

    # compose the window DIRECTLY in packed layout: per window row j, pull
    # the (t_j, u_j) cell's cotangents + label through the one-hot factors:
    # x_w[j] = sum_u G[j, u] * x[t_j, u] = sum_t tsel[j, t] (G @ x^T)[j, t]
    G, tsel = _window_coords(d, stride, WS, BT, U)
    loc_lane = loc_ref[0][0:1, :]
    xu0 = jax.lax.dot_general(
        G, ct0, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # exact one-hot selection
    )                                                 # (WS, BT)
    xu1 = jax.lax.dot_general(
        G, ct1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    ct0_w = jnp.sum(tsel * xu0, axis=1, keepdims=True)  # (WS, 1)
    ct1_w = jnp.sum(tsel * xu1, axis=1, keepdims=True)
    loc_w = jnp.sum(G * loc_lane.astype(jnp.float32), axis=1, keepdims=True)

    v_iota = jax.lax.broadcasted_iota(jnp.int32, (WS, V), 1)
    dense = (
        ct0_w * (v_iota == blank)
        + ct1_w * (v_iota == loc_w.astype(jnp.int32))
    )
    buf[:] = dense
    # rows [0, d): the PREVIOUS tile's values (read back above) must survive
    j8 = jax.lax.broadcasted_iota(jnp.int32, (8, V), 0)
    buf[0:8, :] = jnp.where(j8 < d, head[:], dense[0:8])

    # the output has >= WS pad rows, so the static-size aligned store never
    # clamps; the next tile's write overwrites our overrun tail
    copy = pltpu.make_async_copy(
        buf, out_hbm.at[pl.ds(pl.multiple_of(start8, 8), WS), :], sem
    )
    copy.start()
    copy.wait()


def _host_meta(xn, yn, T, BT):
    """Per-(n, t-tile) packed start rows + per-sample prefix (host math is
    jnp — runs under jit)."""
    xn = xn.astype(jnp.int32)
    yn = yn.astype(jnp.int32)
    sizes = xn * (yn + 1)
    mem_pref = jnp.cumsum(sizes) - sizes
    TT = -(-T // BT)
    tt = jnp.arange(TT, dtype=jnp.int32)[None, :]
    starts = mem_pref[:, None] + tt * BT * (yn[:, None] + 1)
    return starts.reshape(-1), TT


def _loc8(loc_rows, N, U):
    """loc replicated across 8 sublanes: (N, 8, U).  The (1, 8, U) block is
    Mosaic-legal for any U (minor dims (8, U) with U == the full array dim)
    and arrives lane-oriented in the kernel."""
    return jnp.broadcast_to(
        loc_rows.astype(jnp.int32)[:, None, :], (N, 8, U)
    )


def packed_gather_padded(xs, loc_rows, xn, yn, blank: int, T: int, U: int,
                         interpret: bool | None = None):
    """packed (STU, V) + per-row loc -> (blank_col, emit_col) (N, T, U).

    loc_rows: (N, U) int32 — the label gathered into the emit channel at row
    u (next label, blank on each sample's last row), identical semantics to
    `compact_gather`'s loc but in per-sample row form.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = xn.shape[0]
    STU, V = xs.shape
    BT = _choose_bt(T, U, V)
    assert BT is not None, "movement kernel unsupported at this (T, U, V)"
    TT = -(-T // BT)
    starts, _ = _host_meta(xn, yn, T, BT)

    # window rows: shift (< 8 away from the buffer end) + BT*stride valid
    # rows, stride <= U
    W = _round_up(BT * U + 16, 8)
    # Mosaic DMA requires the copied minor extent be 128-lane aligned
    # ("Slice shape along dimension 1 must be aligned to tiling (128)"):
    # pad the vocab dim to Vp when it isn't.
    Vp = _round_up(V, 128)
    xs32 = xs.astype(jnp.float32)
    need = max(W - STU, 0)
    if interpret:
        # XLA's dynamic_slice CLAMPS an out-of-bounds start, which would
        # silently shift the tail window — pad the <8-row overread slack
        # explicitly.  On TPU the (8,128)-tile-padded HBM allocation
        # absorbs it (DMA reads whole tiles; verified by the tpu_check
        # packed parity case with a misaligned STU).
        need = max(need, _round_up(STU, 8) + 8 - STU)
    if need or Vp != V:
        xs32 = jnp.pad(xs32, ((0, need), (0, Vp - V)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N, TT),
        in_specs=[
            pl.BlockSpec((1, 8, U), lambda n, t, *_: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, BT, U), lambda n, t, *_: (n, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT, U), lambda n, t, *_: (n, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, Vp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _gather_kernel, blank=blank, BT=BT, U=U, V=Vp, T=T,
        STU=max(STU, W),  # cl_max >= 0 in the degenerate STU < W case
    )
    TC = TT * BT
    blank_col, emit_col = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, TC, U), jnp.float32),
            jax.ShapeDtypeStruct((N, TC, U), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(starts, yn.astype(jnp.int32), xn.astype(jnp.int32),
      _loc8(loc_rows, N, U), xs32)
    return blank_col[:, :T], emit_col[:, :T]


def packed_scatter_grads(ct0, ct1, loc_rows, xn, yn, blank: int, STU: int,
                         V: int, interpret: bool | None = None):
    """(N, T, U) blank/emit cotangents -> packed (STU, V) gradient rows.

    Exact inverse of `packed_gather_padded`'s extraction: row r gets
    ct0 at the blank column and ct1 at loc (accumulating when loc == blank,
    matching the reference scatter's two writes)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, T, U = ct0.shape
    BT = _choose_bt(T, U, V)
    assert BT is not None, "movement kernel unsupported at this (T, U, V)"
    TT = -(-T // BT)
    starts, _ = _host_meta(xn, yn, T, BT)
    TC = TT * BT
    ct0 = jnp.pad(ct0.astype(jnp.float32), ((0, 0), (0, TC - T), (0, 0)))
    ct1 = jnp.pad(ct1.astype(jnp.float32), ((0, 0), (0, TC - T), (0, 0)))

    WS = _round_up(BT * U + 8, 8)
    Vp = _round_up(V, 128)  # 128-lane DMA alignment (see packed_gather_padded)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N, TT),
        in_specs=[
            pl.BlockSpec((1, 8, U), lambda n, t, *_: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT, U), lambda n, t, *_: (n, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT, U), lambda n, t, *_: (n, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((WS, Vp), jnp.float32),
            pltpu.VMEM((8, Vp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _scatter_kernel, blank=blank, BT=BT, U=U, V=Vp, T=T, STU=STU,
    )
    # rows the tile sweep never reaches (bucketed pad buffers) must come
    # back exactly zero: the output aliases a zeros operand
    PAD = WS + 8
    zeros = jnp.zeros((STU + PAD, Vp), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((STU + PAD, Vp), jnp.float32),
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(starts, yn.astype(jnp.int32), xn.astype(jnp.int32),
      _loc8(loc_rows, N, U), ct0, ct1, zeros)
    return out[:STU, :V]


def _loc_rows(ys, xn, yn, U: int, blank: int):
    """Per-sample row labels (N, U): next label at row u, blank past yn."""
    N = xn.shape[0]
    label_pref = jnp.cumsum(yn) - yn
    u_io = jnp.arange(U, dtype=jnp.int32)[None, :]
    if int(ys.shape[0]) == 0:
        nxt = jnp.full((N, U), blank, jnp.int32)
    else:
        pos = jnp.clip(label_pref[:, None] + u_io, 0, int(ys.shape[0]) - 1)
        nxt = ys.astype(jnp.int32)[pos]
    return jnp.where(u_io < yn[:, None], nxt, blank).astype(jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def packed_lattice(xs, loc_rows, xn, yn, blank: int, T: int, U: int):
    """Differentiable packed (STU, V) -> gathered (N, T, U, 2) lattice.

    Forward and backward are single Pallas passes (`packed_gather_padded` /
    `packed_scatter_grads`) — no XLA gather/scatter anywhere."""
    b, e = packed_gather_padded(xs, loc_rows, xn, yn, blank, T, U)
    return jnp.stack([b, e], axis=-1)


def _pl_fwd(xs, loc_rows, xn, yn, blank, T, U):
    out = packed_lattice(xs, loc_rows, xn, yn, blank, T, U)
    return out, (loc_rows, xn, yn, xs.shape[0], xs.shape[1])


def _pl_bwd(blank, T, U, res, ct):
    loc_rows, xn, yn, STU, V = res
    d_xs = packed_scatter_grads(
        ct[..., 0], ct[..., 1], loc_rows, xn, yn, blank, STU, V
    )
    return d_xs, None, None, None


packed_lattice.defvjp(_pl_fwd, _pl_bwd)
