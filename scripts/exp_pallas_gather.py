"""EXPERIMENT (rejected): Pallas streaming blank/label gather + scatter for
huge (N, T, U, V) tensors.  Kept under scripts/ as the measured record for
`functional/gather.py`'s design notes — NOT part of the package.

Outcome on v5e: the streaming (full-read) kernel and the dense scatter
kernel both force an operand relayout copy (Pallas requires linear row-major
layouts; the default tiled layout of the 7.5 GB operand pads U=21 -> 24),
which RESOURCE_EXHAUSTs the chip; the sparse-window kernel avoids the read
but pays the same relayout (26.3 ms measured via the 4D reshape).  The
winning formulation is pure XLA: flat take_along_axis on the (N, T, U*V)
view (10.6 ms vs 23.7 ms at 7.5 GB) — see `gather._gather_4d_flat3d`.

Original design notes:

XLA's `take_along_axis` on the padded lattice is a sparse gather that runs
near-free below ~4 GB but falls off a cliff above it (measured: 3.0 ms at
4.0 GB -> 10+ ms at 6 GB -> ~23.7 ms at 7.5 GB; presumably the 32-bit byte
offset limit).  The dense compare-select VJP write has the same problem in
reverse.  These kernels replace both for big operands by streaming the
tensor through VMEM one (BT, U, BV) block at a time — with BV covering the
whole vocabulary the block is a single contiguous HBM span, so the stream
runs at DMA speed-of-light:

  forward  (reference `core_gather.cu`'s reason to exist, and the python
            gather `pytorch_binding/warp_rnnt/__init__.py:118-128`):
            read xs once, emit the (N, T, U) blank/label channels directly;
  backward (reference autograd scatter semantics): write d_xs once,
            d_xs[n,t,u,v] = ct_blank*(v==blank) + ct_label*(v==lab[n,u]),
            both terms accumulating when lab == blank (terminal rows).

The label index is constant along T (it only depends on (n, u)), so the
whole index state is a (N, 1, U) int32 operand — no (N, T, U) loc tensor is
ever materialized.  Out-of-range block cells (t >= T edge blocks, v >= V
garbage lanes) never poison results: garbage lanes can't equal a label id
< V, and garbage rows only feed writes Pallas masks at the array boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 64 << 20


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _choose_blocks(T: int, U: int, V: int):
    """(BT, BV): one xs block is (BT, U, BV) fp32 staged through VMEM."""
    BV = min(_round_up(V, 128), 8192)
    # U pads to a multiple of 8 sublanes in VMEM; keep a block <= ~4 MB
    bt = (4 << 20) // (4 * _round_up(U, 8) * BV)
    BT = min(T, max(8, (bt // 8) * 8))
    return BT, BV


def _gather_kernel(lab_ref, xs_ref, blank_out_ref, lab_out_ref, *,
                   blank: int, BV: int, GV: int):
    gv = pl.program_id(2)

    x = xs_ref[0]  # (BT, U, BV)
    U = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2) + gv * BV
    lab3 = lab_ref[0, 0, :].reshape(1, U, 1)

    lab_sum = jnp.sum(jnp.where(lane == lab3, x, 0.0), axis=2)  # (BT, U)
    blank_sum = jnp.sum(jnp.where(lane == blank, x, 0.0), axis=2)

    @pl.when(gv == 0)
    def _():
        blank_out_ref[0] = blank_sum
        lab_out_ref[0] = lab_sum

    if GV > 1:
        @pl.when(gv > 0)
        def _():
            blank_out_ref[0] += blank_sum
            lab_out_ref[0] += lab_sum


def gather_fwd_pallas(xs, labels_ext, blank: int):
    """xs (N, T, U, V) fp32, labels_ext (N, U) int32 (last column = blank).

    Returns (blank_col, label_col), each (N, T, U) fp32 — the two gathered
    lattice channels.
    """
    N, T, U, V = xs.shape
    BT, BV = _choose_blocks(T, U, V)
    GT = -(-T // BT)
    GV = -(-V // BV)

    xs_spec = pl.BlockSpec(
        (1, BT, U, BV), lambda n, gt, gv: (n, gt, 0, gv),
        memory_space=pltpu.VMEM,
    )
    lab_spec = pl.BlockSpec(
        (1, 1, U), lambda n, gt, gv: (n, 0, 0), memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, BT, U), lambda n, gt, gv: (n, gt, 0), memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(_gather_kernel, blank=blank, BV=BV, GV=GV)
    blank_col, label_col = pl.pallas_call(
        kernel,
        grid=(N, GT, GV),
        in_specs=[lab_spec, xs_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((N, T, U), jnp.float32),
            jax.ShapeDtypeStruct((N, T, U), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() != "tpu",
    )(labels_ext.astype(jnp.int32).reshape(N, 1, U), xs)
    return blank_col, label_col


def _sparse_gather_kernel(flat_ref, xs_lab_ref, xs_blank_ref,
                          blank_out_ref, lab_out_ref, *, V: int, blank: int):
    n = pl.program_id(0)
    gt = pl.program_id(1)
    u = pl.program_id(2)

    x = xs_lab_ref[0]  # (BT, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    off = jax.lax.rem(flat_ref[n, u], 128)
    lab_row = jnp.sum(jnp.where(lane == off, x, 0.0), axis=1)  # (BT,)

    xb = xs_blank_ref[0]
    boff = jax.lax.rem(u * V + blank, 128)
    blank_row = jnp.sum(jnp.where(lane == boff, xb, 0.0), axis=1)

    blank_out_ref[0, u, :] = blank_row
    lab_out_ref[0, u, :] = lab_row


def gather_fwd_sparse(xs3, labels_ext, blank: int, V: int):
    """Sparse-window gather: reads only one 128-lane window per (n, u, t)
    instead of streaming the whole tensor — the TPU-native equivalent of the
    fast sparse gather XLA loses above ~4 GB.

    xs3: (N, T, U*V) — the flattened (U, V) view.  labels_ext (N, U) int32.
    Returns (blank_col, label_col), each (N, U, T) fp32 (note the layout).
    """
    N, T, UV = xs3.shape
    U = UV // V
    # BT serves as the xs window's sublane dim (needs 8 | BT or BT == T) AND
    # the output block's lane dim (needs 128 | BT or BT == T)
    BT = T if T < 128 else min(512, (T // 128) * 128)
    GT = -(-T // BT)

    flat = labels_ext.astype(jnp.int32) + (
        jnp.arange(U, dtype=jnp.int32) * V
    )[None, :]

    grid = (N, GT, U)
    lab_window = pl.BlockSpec(
        (1, BT, 128),
        lambda n, gt, u, flat_ref: (n, gt, flat_ref[n, u] // 128),
        memory_space=pltpu.VMEM,
    )
    blank_window = pl.BlockSpec(
        (1, BT, 128),
        lambda n, gt, u, flat_ref: (n, gt, (u * V + blank) // 128),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, U, BT), lambda n, gt, u, flat_ref: (n, 0, gt),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(_sparse_gather_kernel, V=V, blank=blank)
    blank_ut, lab_ut = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[lab_window, blank_window],
            out_specs=[out_spec, out_spec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((N, U, T), jnp.float32),
            jax.ShapeDtypeStruct((N, U, T), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() != "tpu",
    )(flat, xs3, xs3)
    return blank_ut, lab_ut


def _scatter_kernel(lab_ref, ctb_ref, ctl_ref, dxs_ref, *,
                    blank: int, BV: int):
    gv = pl.program_id(2)

    shape = dxs_ref.shape[1:]  # (BT, U, BV)
    U = shape[1]
    ctb = ctb_ref[0][:, :, None]  # (BT, U, 1)
    ctl = ctl_ref[0][:, :, None]
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 2) + gv * BV
    lab3 = lab_ref[0, 0, :].reshape(1, U, 1)
    d = jnp.where(lane == blank, ctb, 0.0) + jnp.where(lane == lab3, ctl, 0.0)
    dxs_ref[0] = d


def scatter_bwd_pallas(ct_blank, ct_label, labels_ext, blank: int, V: int):
    """VJP of the forward gather: dense (N, T, U, V) cotangent with the two
    nonzeros per row (accumulating when lab == blank).

    ct_blank / ct_label: (N, T, U) fp32.
    """
    N, T, U = ct_blank.shape
    BT, BV = _choose_blocks(T, U, V)
    GT = -(-T // BT)
    GV = -(-V // BV)

    ct_spec = pl.BlockSpec(
        (1, BT, U), lambda n, gt, gv: (n, gt, 0), memory_space=pltpu.VMEM,
    )
    lab_spec = pl.BlockSpec(
        (1, 1, U), lambda n, gt, gv: (n, 0, 0), memory_space=pltpu.VMEM,
    )
    dxs_spec = pl.BlockSpec(
        (1, BT, U, BV), lambda n, gt, gv: (n, gt, 0, gv),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(_scatter_kernel, blank=blank, BV=BV)
    dxs = pl.pallas_call(
        kernel,
        grid=(N, GT, GV),
        in_specs=[lab_spec, ct_spec, ct_spec],
        out_specs=dxs_spec,
        out_shape=jax.ShapeDtypeStruct((N, T, U, V), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() != "tpu",
    )(labels_ext.astype(jnp.int32).reshape(N, 1, U),
      ct_blank.astype(jnp.float32), ct_label.astype(jnp.float32))
    return dxs
