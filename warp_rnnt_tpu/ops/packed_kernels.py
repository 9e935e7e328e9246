"""Pallas kernels for the compact (packed) layout's data movement.

The reference's compact CUDA kernels (`core_compact.cu:403-484`) index packed
rows directly — per-thread offset arithmetic is free on a GPU.  The XLA
equivalents are not free on TPU: every formulation of the ragged
packed<->padded movement lowers to a gather/iota-select class that runs at
~26-28 GB/s (measured, scripts/exp_compact_micro.py):

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
    consecutive), an in-VMEM dynamic-offset reslice de-interleaves the
    ragged (yn+1)-strided frames to U-strided ones, and a compare-mask
    extracts the blank/label columns on the VPU (VMEM-resident iota-select
    is ~50x cheaper than the HBM-level fusion).
  * `packed_scatter_grads`: the exact inverse for the backward pass — the
    dense two-nonzero gradient rows are composed in VMEM and DMA'd back to
    the packed buffer at the sample's offsets.  Overlapping tail writes
    (the U-vs-(yn+1) stride mismatch) are resolved by ascending write
    order: each frame/tile overwrites its predecessor's overrun.

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

_VMEM_LIMIT = 64 << 20


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _choose_bt(T: int, U: int, V: int):
    """Frames per grid step, or None when the kernel cannot run.

    Mosaic requires the (BT, U) out-block's second-minor dim be a multiple
    of 8 (or the whole dim), and VMEM must hold ~3 slabs of (BT*U, V) fp32;
    configs violating both (huge U AND huge V) fall back to the XLA path.
    """
    budget = int(_VMEM_LIMIT * 0.5)
    by_vmem = budget // (3 * U * V * 4)
    if T < 8:
        return T if by_vmem >= T else None
    bt = (min(by_vmem, 32, T) // 8) * 8
    return int(bt) if bt >= 8 else None


def movement_kernel_supported(T: int, U: int, V: int) -> bool:
    return _choose_bt(T, U, _round_up(V, 128)) is not None


def _gather_kernel(starts_ref, yn_ref, xn_ref, loc_ref, xs_hbm,
                   blank_ref, emit_ref, buf, resl, sem,
                   *, blank: int, BT: int, U: int, V: int, T: int, STU: int):
    n = pl.program_id(0)
    tt = pl.program_id(1)
    ynn = yn_ref[n]          # labels of sample n
    xnn = xn_ref[n]
    stride = ynn + 1         # packed rows per frame
    W = BT * U + U           # window rows: frame reads stay in-bounds even
    #                          for the masked u > yn tail (stride < U)

    W = _round_up(W + 8, 8)  # 8-row DMA alignment slack

    start = starts_ref[n * pl.num_programs(1) + tt]
    # 8-row-aligned DMA start; clamp to the padded buffer (STU + W rows) —
    # a nonzero overflow shift happens only for fully-invalid tiles (start
    # beyond STU), whose outputs are masked
    cl = jnp.minimum((start // 8) * 8, (STU // 8) * 8)
    shift = start - cl

    copy = pltpu.make_async_copy(
        xs_hbm.at[pl.ds(cl, W), :], buf, sem
    )
    copy.start()
    copy.wait()

    # de-interleave: padded frame t rows live at buf[shift + t*stride + u]
    for t in range(BT):
        off = jnp.minimum(shift + t * stride, W - U)
        resl[t * U:(t + 1) * U, :] = buf[pl.ds(off, U), :]

    r3 = resl[:].reshape(BT, U, V)
    v_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, U, V), 2)
    loc = loc_ref[pl.ds(n, 1), :].reshape(1, U, 1)
    emit = jnp.sum(jnp.where(v_iota == loc, r3, 0.0), axis=-1)
    blank_c = jnp.sum(jnp.where(v_iota == blank, r3, 0.0), axis=-1)

    # mask cells outside the sample's lattice (garbage reads)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, U), 0) + tt * BT
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, U), 1)
    ok = (t_iota < xnn) & (u_iota <= ynn)
    blank_ref[0] = jnp.where(ok, blank_c, 0.0)
    emit_ref[0] = jnp.where(ok, emit, 0.0)


def _scatter_kernel(starts_ref, yn_ref, xn_ref, loc_ref, ct0_ref, ct1_ref,
                    zeros_hbm, out_hbm, buf, sem,
                    *, blank: int, BT: int, U: int, V: int, T: int, STU: int):
    n = pl.program_id(0)
    tt = pl.program_id(1)
    ynn = yn_ref[n]
    xnn = xn_ref[n]
    stride = ynn + 1
    WS = _round_up(BT * U + 8, 8)
    # clamp fully-invalid tiles (start beyond STU) into the pad region;
    # their payload is all-zero so the clamped write is harmless
    start = jnp.minimum(
        starts_ref[n * pl.num_programs(1) + tt], STU
    )
    # DMA writes are 8-row aligned: read-modify-write the aligned head so
    # rows [start8, start) — written by the PREVIOUS tile (grid order is
    # ascending packed offsets) — survive this tile's aligned store
    start8 = (start // 8) * 8
    d = start - start8
    head = pltpu.make_async_copy(
        out_hbm.at[pl.ds(start8, 8), :], buf.at[0:8, :], sem
    )
    head.start()
    head.wait()

    # dense two-nonzero rows for this tile, in padded (BT, U) layout
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, U), 0) + tt * BT
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, U), 1)
    ok = (t_iota < xnn) & (u_iota <= ynn)
    ct0 = jnp.where(ok, ct0_ref[0], 0.0)
    ct1 = jnp.where(ok, ct1_ref[0], 0.0)
    v_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, U, V), 2)
    loc = loc_ref[pl.ds(n, 1), :].reshape(1, U, 1)
    dense = (
        ct0[..., None] * (v_iota == blank) + ct1[..., None] * (v_iota == loc)
    ).reshape(BT * U, V)

    # re-interleave to the packed stride; ascending frames overwrite the
    # previous frame's overrun tail (rows past yn+1)
    for t in range(BT):
        buf[pl.ds(d + t * stride, U), :] = dense[t * U:(t + 1) * U, :]

    # the output has >= WS pad rows, so the static-size aligned store never
    # clamps; the next tile's write overwrites our overrun tail
    copy = pltpu.make_async_copy(
        buf.at[0:WS, :], out_hbm.at[pl.ds(start8, WS), :], sem
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
    # Mosaic DMA slices must cover whole 128-lane tiles: run the kernel at
    # Vp = roundup(V, 128).  The host-side minor-dim pad is a bandwidth
    # copy; unpadded V would instead force a full operand relayout at the
    # pallas boundary (the known (R, smallV) layout hazard).
    Vp = _round_up(V, 128)
    BT = _choose_bt(T, U, Vp)
    assert BT is not None, "movement kernel unsupported at this (T, U, V)"
    TT = -(-T // BT)
    starts, _ = _host_meta(xn, yn, T, BT)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N, TT),
        in_specs=[
            pl.BlockSpec((N, U), lambda n, t, *_: (0, 0),
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
            pltpu.VMEM((_round_up(BT * U + U + 8, 8), Vp), jnp.float32),
            pltpu.VMEM((BT * U, Vp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _gather_kernel, blank=blank, BT=BT, U=U, V=Vp, T=T, STU=STU,
    )
    # pad rows so the clamped read window always fits, and the vocab dim to
    # the 128-lane tile
    W = _round_up(BT * U + U + 8 + 8, 8)
    xs_pad = jnp.pad(xs.astype(jnp.float32), ((0, W), (0, Vp - V)))
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
      loc_rows.astype(jnp.int32), xs_pad)
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
    Vp = _round_up(V, 128)
    BT = _choose_bt(T, U, Vp)
    assert BT is not None, "movement kernel unsupported at this (T, U, V)"
    TT = -(-T // BT)
    starts, _ = _host_meta(xn, yn, T, BT)
    TC = TT * BT
    ct0 = jnp.pad(ct0.astype(jnp.float32), ((0, 0), (0, TC - T), (0, 0)))
    ct1 = jnp.pad(ct1.astype(jnp.float32), ((0, 0), (0, TC - T), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N, TT),
        in_specs=[
            pl.BlockSpec((N, U), lambda n, t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT, U), lambda n, t, *_: (n, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BT, U), lambda n, t, *_: (n, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((_round_up(BT * U + 8, 8), Vp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _scatter_kernel, blank=blank, BT=BT, U=U, V=Vp, T=T, STU=STU,
    )
    # rows the tile sweep never reaches (bucketed pad buffers) must come
    # back exactly zero: the output aliases a zeros operand
    PAD = _round_up(BT * U + 8, 8) + 8
    zeros = jnp.zeros((STU + PAD, Vp), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((STU + PAD, Vp), jnp.float32),
        input_output_aliases={6: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(starts, yn.astype(jnp.int32), xn.astype(jnp.int32),
      loc_rows.astype(jnp.int32), ct0, ct1, zeros)
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
