"""Pallas kernels for the flat (N, T, U*V) lattice layout.

The flat layout is the production form above the >4 GiB gather cliff
(`functional/gather.py:_FLAT3D_BYTES`): XLA gathers it at its flat
per-scalar cost with no 4D relayout.  The *backward* is the problem this
module solves: the dense compare-select VJP write

    d_xs[n, t, u, v] = ct0[n, t, u] * [v == blank] + ct1[n, t, u] * [v == loc]

is naturally expressed over the logical 4D view, and reshaping that 4D
fusion output to (N, T, U*V) forces a full relayout copy of the largest
tensor in the program — the (U, V) minor dims are (8, 128)-tile-padded while
the flat U*V minor dim is packed, so no bitcast exists.  Measured at
N=128, T=150, U=21, V=5000 (7.5 GB): the reshape turns a ~10 ms write into
a 68 ms pass (loss+grad 68.4 ms vs 22.5 ms for the plain 4D path).

`flat_grad_write` emits the cotangent directly in flat coordinates: the
grid tiles (N, T, U*V) into (BT, BJ) lane blocks with BJ <= V, so each
block intersects at most two consecutive u rows (u0 = j0 // V, prefetched
per block — no vector integer divide anywhere, cf. `packed_kernels`).  The
two candidates' cotangent columns and label are pulled from the (BT, U)
block by one-hot masked sums on the VPU, and the block is two compares and
two multiplies per element — write-bandwidth-bound.

Contract: the label index is frame-invariant (loc[n, t, u] identical for
every t — the production index construction in `functional/loss.py:76`),
so the kernel takes per-sample label rows (N, U).  When `loc == blank`
(terminal lattice rows) both terms target the same flat position and
accumulate, matching the reference scatter semantics
(`core_compact.cu:456-484`).

Mirrors the reference's large-vocab memory design goal
(`core_gather.cu:359-388`): the 2-wide lattice is the only dense gradient
state; everything vocabulary-sized is a single streaming pass.
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


def _choose_blocks(N: int, T: int, V: int):
    """(BN, BT, BJ): BJ a 128-multiple <= V (so a block spans <= 2 u rows);
    BT covers T whole up to 512 rows; BN groups samples until a write block
    reaches ~8 MB (fewer grid steps amortize the per-step sync overhead)."""
    BJ = min(4096, (V // 128) * 128)
    if BJ == 0:
        return None, None, None
    BT = _round_up(min(T, 512), 8)
    BN = max(1, min(N, (8 << 20) // (BT * BJ * 4)))
    return BN, BT, BJ


def flat_write_supported(V: int) -> bool:
    return V >= 128


def _flat_write_kernel(u0_ref, ct0_ref, ct1_ref, loc_ref, out_ref,
                       *, blank: int, V: int, BJ: int, U: int):
    jb = pl.program_id(2)
    j0 = jb * BJ
    u0 = u0_ref[jb]
    u1 = jnp.minimum(u0 + 1, U - 1)   # == u0 only in the tail past U*V
    ct0 = ct0_ref[...]                                 # (BN, BT, U) f32
    ct1 = ct1_ref[...]
    loc_lane = loc_ref[:, 0:1, :]                      # (BN, 1, U) int32
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, U), 2)

    def pick(u):
        """(BN, BT, 1) cotangent columns + (BN, 1, 1) label at row u."""
        sel = u_iota == u
        c0 = jnp.sum(jnp.where(sel, ct0, 0.0), axis=2, keepdims=True)
        c1 = jnp.sum(jnp.where(sel, ct1, 0.0), axis=2, keepdims=True)
        lu = jnp.sum(jnp.where(sel, loc_lane, 0), axis=2, keepdims=True)
        return c0, c1, lu

    c0a, c1a, la = pick(u0)
    jrow = j0 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, BJ), 2)
    # does this block straddle a u boundary?  blocks are BJ <= V wide, so
    # at most one boundary (at (u0+1)*V) can fall inside
    straddles = (u0 + 1) * V < j0 + BJ

    # all index structure lives on a single (1, 1, BJ) lane row; the
    # (BN, BT, BJ)-wide work is a broadcast multiply-add per hit mask
    @pl.when(jnp.logical_not(straddles))
    def _():
        # fast path (the common case at large V): the whole block lies in
        # row u0 — two masks, two broadcast multiplies, one add
        hit_blank = (jrow == u0 * V + blank).astype(jnp.float32)
        hit_label = (jrow == u0 * V + la).astype(jnp.float32)
        d = c0a * hit_blank + c1a * hit_label
        out_ref[...] = d.astype(out_ref.dtype)

    @pl.when(straddles)
    def _():
        c0b, c1b, lb = pick(u1)
        in_b = jrow >= (u0 + 1) * V                    # (1, 1, BJ)
        hit_blank = jrow == jnp.where(in_b, u1 * V + blank, u0 * V + blank)
        hit_label = jrow == jnp.where(in_b, u1 * V + lb, u0 * V + la)
        c0 = jnp.where(in_b, c0b, c0a)                 # (BN, BT, BJ)
        c1 = jnp.where(in_b, c1b, c1a)
        d = c0 * hit_blank.astype(jnp.float32) + c1 * hit_label.astype(
            jnp.float32
        )
        out_ref[...] = d.astype(out_ref.dtype)


def flat_grad_write(ct0, ct1, loc_rows, blank: int, V: int, UV: int,
                    out_dtype=jnp.float32, interpret: bool | None = None,
                    out_alias=None):
    """(N, T, U) blank/label cotangents -> flat (N, T, U*V) gradient.

    loc_rows: (N, U) int32 frame-invariant label indices (< V).

    out_alias: optional (N, T, U*V) array of ``out_dtype`` whose buffer the
    kernel writes in place (`input_output_aliases`; the operand is never
    read — every output block is fully overwritten).  Production callers
    pass the flat log_probs the gradient is *for*: at the >4 GiB scale this
    path exists for, training steps donate the log_probs, and without the
    alias XLA cannot satisfy that donation from an opaque custom-call
    result — it inserts a full copy of the output into the donated buffer
    (measured +24.7 ms on the 7.5 GB N=128, V=5000 row: 47.3 ms loss+grad
    vs 22.6 for the plain 4D path whose grad write is a fusion, which CAN
    write donated buffers in place).  With the alias the custom call writes
    the donated buffer directly.  When the caller does *not* donate, XLA
    protects the operand with exactly the copy it would otherwise append —
    aliasing never loses.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, T, U = ct0.shape
    assert UV == U * V, (UV, U, V)
    BN, BT, BJ = _choose_blocks(N, T, V)
    assert BJ is not None, "flat write kernel unsupported at this V"
    JJ = -(-UV // BJ)
    TT = -(-T // BT)
    NN = -(-N // BN)
    u0s = (jnp.arange(JJ, dtype=jnp.int32) * BJ) // V

    loc8 = jnp.broadcast_to(
        loc_rows.astype(jnp.int32)[:, None, :], (N, 8, U)
    )
    in_specs = [
        pl.BlockSpec((BN, BT, U), lambda n, t, j, *_: (n, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BN, BT, U), lambda n, t, j, *_: (n, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BN, 8, U), lambda n, t, j, *_: (n, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(
        _flat_write_kernel, blank=blank, V=V, BJ=BJ, U=U
    )
    operands = [u0s, ct0.astype(jnp.float32), ct1.astype(jnp.float32), loc8]
    aliases = {}
    if out_alias is not None:
        assert out_alias.shape == (N, T, UV) and out_alias.dtype == out_dtype
        # stays in HBM (pl.ANY): its buffer IS the output; no DMA, no read
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(out_alias)
        body = kernel

        def kernel(u0_ref, ct0_ref, ct1_ref, loc_ref, alias_ref, out_ref):
            del alias_ref
            body(u0_ref, ct0_ref, ct1_ref, loc_ref, out_ref)

        aliases = {4: 0}  # operand index counts the scalar-prefetch arg
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NN, TT, JJ),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BN, BT, BJ), lambda n, t, j, *_: (n, t, j),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, T, UV), out_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        input_output_aliases=aliases,
        interpret=interpret,
    )(*operands)
