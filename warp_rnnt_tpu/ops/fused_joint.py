"""Fused joint-projection + RNN-T loss lattice (Pallas TPU kernel).

The reference architecture REQUIRES materialized (N, T, U, V) log-probs
before the loss (`README.md:59`); even our fused from-logits path still
materializes raw logits.  At production joint sizes that tensor is the
largest buffer in the training step (N=16, T=150, U=21, V=5000 -> 1.0 GB
fp32) and its HBM round-trips dominate the step.

This kernel removes it: consuming the PROJECTED joint halves

    a = f @ A + b_pre   (N, T, H)     c = g @ C   (N, U, H)

(both joint modes reduce to this form: "add" has A = C = W_pre, "concat"
splits W_pre into row blocks), it computes per (t,) tile on the MXU

    h      = tanh(a_t + c_u)                  # (BT*U, H) in bf16
    logits = h @ W_out + b_out                # (BT*U, V) fp32 accum

and emits ONLY the per-cell blank logit, label logit, and logsumexp — three
(N, T, U) tensors.  The (N, T, U, V) logits tensor never touches HBM in
either direction: the backward kernel recomputes h and the softmax per tile
from (a, c, logZ) and accumulates d_a, d_c, d_W, d_b in VMEM.

Tiling: the U axis is kept WHOLE in every block (RNN-T label rows are short
— tens to a few hundred), because Mosaic requires a block's minor dim to be
a multiple of 128 or the full array dim; blocking U would violate that.
The grid is (N, T-blocks[, V-blocks]) and the per-tile MXU M-dim is
BT * round_up(U, 8) rows.

FLOP cost is the joint projection itself (N*T*U*(H*V) MACs, bf16 on the
MXU); HBM traffic is O(N*T*(H+U)) — asymptotically V-free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 96 << 20


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _tiles(T: int, U: int):
    """Choose (BT, BU).  BU = round_up(U, 8): the label axis is never
    blocked (see module docstring).  BT targets ~512 lattice rows per tile
    (the MXU M-dim), shrinking to 8 for very long label sequences."""
    BU = _round_up(max(U, 1), 8)
    cap = ((512 // BU) // 8) * 8
    BT = max(8, min(_round_up(T, 8), max(cap, 8)))
    return BT, BU


def _fwd_kernel(xn_ref, yn_ref, a_ref, c_ref, w_ref, b_ref, lab_ref,
                blank_ref, emit_ref, logz_ref, *, blank: int,
                T: int, U: int, BT: int, BU: int):
    n = pl.program_id(0)
    ti = pl.program_id(1)
    # Ragged-length tile skip: a tile with no t < xn row does no MXU work
    # (at typical random lengths a large tail of tiles is dead).  The
    # outputs still get defined values (zeros) — rnnt_core masks cells
    # beyond the lengths, but NaN-from-uninitialized would poison masking.
    live = ti * BT < xn_ref[n]

    @pl.when(live)
    def _():
        a = a_ref[0]            # (BT, H) fp32
        c = c_ref[0]            # (BU, H) fp32
        h = jnp.tanh(a[:, None, :] + c[None, :, :])          # (BT, BU, H)
        hm = h.reshape(BT * BU, -1).astype(jnp.bfloat16)
        w = w_ref[:]                                          # (H, V) bf16
        z = jax.lax.dot_general(
            hm, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[0][None, :]                                 # (BT*BU, V) fp32
        V = z.shape[-1]
        z3 = z.reshape(BT, BU, V)
        m = jnp.max(z3, axis=-1)
        logz = m + jnp.log(jnp.sum(jnp.exp(z3 - m[..., None]), axis=-1))
        lab = lab_ref[0].reshape(1, BU, 1)                    # int32
        v_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, BU, V), 2)
        emit = jnp.sum(jnp.where(v_iota == lab, z3, 0.0), axis=-1)
        blank_ref[0] = z3[:, :, blank]
        emit_ref[0] = emit
        logz_ref[0] = logz

    @pl.when(jnp.logical_not(live))
    def _():
        blank_ref[0] = jnp.zeros_like(blank_ref[0])
        emit_ref[0] = jnp.zeros_like(emit_ref[0])
        logz_ref[0] = jnp.zeros_like(logz_ref[0])


def _bwd_kernel(xn_ref, yn_ref, a_ref, c_ref, w_ref, b_ref, lab_ref, logz_ref,
                db_ref, de_ref,
                da_ref, dc_ref, dw_ref, dbias_ref, *, blank: int,
                T: int, U: int, BT: int, BU: int):
    n = pl.program_id(0)
    ti = pl.program_id(1)

    @pl.when((n == 0) & (ti == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    @pl.when(ti == 0)
    def _():
        dc_ref[:] = jnp.zeros_like(dc_ref)

    # da's (n, ti) block is visited exactly once: define it, overwrite below.
    da_ref[:] = jnp.zeros_like(da_ref)

    # Ragged-length tile skip (see _fwd_kernel): dead tiles have all-zero
    # db/de cotangents (rnnt_core's grads are zero beyond the lengths), so
    # skipping contributes exactly nothing to any accumulator.
    live = ti * BT < xn_ref[n]

    @pl.when(live)
    def _():
        a = a_ref[0]
        c = c_ref[0]
        h = jnp.tanh(a[:, None, :] + c[None, :, :])           # (BT, BU, H) fp32
        hm = h.reshape(BT * BU, -1).astype(jnp.bfloat16)
        w = w_ref[:]                                          # (H, V) bf16
        z = jax.lax.dot_general(
            hm, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[0][None, :]                                 # logits, with bias
        V = z.shape[-1]
        z3 = z.reshape(BT, BU, V)

        # valid-cell mask: block-edge padding rows carry undefined values
        t_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, BU), 0) + ti * BT
        u_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, BU), 1)
        valid = (t_iota < T) & (u_iota < U)

        db = jnp.where(valid, db_ref[0], 0.0)
        de = jnp.where(valid, de_ref[0], 0.0)
        sm = jnp.exp(z3 - logz_ref[0][..., None])             # softmax (recomputed)
        lab = lab_ref[0].reshape(1, BU, 1)
        v_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, BU, V), 2)
        # d logits = db*[v==blank] + de*[v==lab] - softmax * (db + de).
        # (No separate valid-mask on dz3: every term carries the already-
        # masked db/de factor, so invalid cells are exactly zero — and a
        # bool [..., None] reshape is un-lowerable in Mosaic anyway.)
        dz3 = (
            db[..., None] * (v_iota == blank)
            + de[..., None] * (v_iota == lab)
            - sm * (db + de)[..., None]
        )
        dz = dz3.reshape(BT * BU, V)

        # d_h = dz @ W^T  (contract over V)
        dhm = jax.lax.dot_general(
            dz.astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # (BT*BU, H)
        dpre = dhm.reshape(BT, BU, -1) * (1.0 - h * h)        # tanh'
        da_ref[0] = jnp.sum(dpre, axis=1)
        dc_ref[0] += jnp.sum(dpre, axis=0)

        # d_W += h^T @ dz, d_b += colsum(dz)
        dw_ref[:] += jax.lax.dot_general(
            hm, dz.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbias_ref[0] += jnp.sum(dz, axis=0)


# Trace-time override for cross-platform lowering (jax2tf): None = decide
# from the runtime backend; True/False force the Pallas interpreter / Mosaic.
# Single-platform serialization (tf_binding._graph_fused) sets this so a
# conversion targeting tpu embeds the real kernel even when traced on a cpu
# host, mirroring functional/core.py's `impl="platform"` dispatch.
_FORCE_INTERPRET: bool | None = None


def _interpret():
    if _FORCE_INTERPRET is not None:
        return _FORCE_INTERPRET
    return jax.default_backend() != "tpu"


# Test hook: force a specific V-block size (None = auto).
_FORCE_BV = None

_BV_CANDIDATES = (2048, 1024, 512, 256, 128)


def _vmem_need(BT: int, BU: int, H: int, Vblk: int) -> int:
    """Rough resident VMEM for one tile at logits width Vblk: w bf16 + dw
    fp32 (backward) + ~6 (BT*BU, Vblk) fp32 logits-class buffers."""
    return H * Vblk * 2 + H * Vblk * 4 + 6 * BT * BU * Vblk * 4


def fused_joint_supported(T: int, U: int, H: int, V: int) -> bool:
    """Whether the SINGLE-V-block kernel's VMEM working set fits.  Beyond
    this — LLM-size vocabularies — the V-grid-blocked kernels take over
    (running logsumexp across V-blocks; backward split into da/dc and dw/db
    passes)."""
    BT, BU = _tiles(T, U)
    return _vmem_need(BT, BU, H, _round_up(V, 128)) <= int(_VMEM_LIMIT * 0.6)


def _select_bv(T: int, U: int, H: int, V: int):
    """None -> single-block kernels; else the V-block size for the blocked
    kernels (vocab padded to a multiple of it with -inf logits)."""
    if _FORCE_BV is not None:
        return None if _FORCE_BV >= V else _FORCE_BV
    if fused_joint_supported(T, U, H, V):
        return None
    BT, BU = _tiles(T, U)
    for bv in _BV_CANDIDATES:
        if bv < V and _vmem_need(BT, BU, H, bv) <= int(_VMEM_LIMIT * 0.6):
            return bv
    return _BV_CANDIDATES[-1]


def _pad_vocab(w, b, BV: int):
    """Pad (H, V) weights with zero columns and the bias with -1e30 so the
    padded logits are ~-inf: exp() -> 0 in the running logsumexp, the
    compare-masks never select them (global v >= V), and the backward's
    softmax is exactly 0 there."""
    V = w.shape[1]
    Vp = _round_up(V, BV)
    if Vp == V:
        return w, b, Vp
    w_p = jnp.pad(w, ((0, 0), (0, Vp - V)))
    b_p = jnp.pad(b, (0, Vp - V), constant_values=-1.0e30)
    return w_p, b_p, Vp


def _pad_to(x, dim, size):
    pad = [(0, 0)] * x.ndim
    pad[dim] = (0, size - x.shape[dim])
    return jnp.pad(x, pad) if size != x.shape[dim] else x


def _fwd_kernel_vb(xn_ref, yn_ref, a_ref, c_ref, w_ref, b_ref, lab_ref,
                   blank_ref, emit_ref, logz_ref, m_sc, s_sc, bl_sc, em_sc,
                   *, blank: int, T: int, U: int, BT: int, BU: int, BV: int,
                   VV: int):
    """V-blocked forward: running (max, sum) logsumexp across the vi grid
    dim (fastest-iterating), blank/emit accumulated by global-index
    compare-mask; outputs written on the last V-block."""
    n = pl.program_id(0)
    ti = pl.program_id(1)
    vi = pl.program_id(2)
    live = ti * BT < xn_ref[n]

    @pl.when(vi == 0)
    def _():
        m_sc[:] = jnp.full_like(m_sc, -1.0e30)
        s_sc[:] = jnp.zeros_like(s_sc)
        bl_sc[:] = jnp.zeros_like(bl_sc)
        em_sc[:] = jnp.zeros_like(em_sc)

    @pl.when(live)
    def _():
        a = a_ref[0]
        c = c_ref[0]
        h = jnp.tanh(a[:, None, :] + c[None, :, :])
        hm = h.reshape(BT * BU, -1).astype(jnp.bfloat16)
        z = jax.lax.dot_general(
            hm, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[0][None, :]
        z3 = z.reshape(BT, BU, BV)
        v_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, BU, BV), 2) + vi * BV
        lab = lab_ref[0].reshape(1, BU, 1)
        bl_sc[:] += jnp.sum(jnp.where(v_iota == blank, z3, 0.0), axis=-1)
        em_sc[:] += jnp.sum(jnp.where(v_iota == lab, z3, 0.0), axis=-1)
        bm = jnp.max(z3, axis=-1)
        m_new = jnp.maximum(m_sc[:], bm)
        s_sc[:] = s_sc[:] * jnp.exp(m_sc[:] - m_new) + jnp.sum(
            jnp.exp(z3 - m_new[..., None]), axis=-1
        )
        m_sc[:] = m_new

    @pl.when(vi == VV - 1)
    def _():
        on = jnp.broadcast_to(live, (BT, BU))
        blank_ref[0] = jnp.where(on, bl_sc[:], 0.0)
        emit_ref[0] = jnp.where(on, em_sc[:], 0.0)
        logz_ref[0] = jnp.where(on, m_sc[:] + jnp.log(s_sc[:]), 0.0)


def _bwd_dadc_kernel_vb(xn_ref, yn_ref, a_ref, c_ref, w_ref, b_ref, lab_ref,
                        logz_ref, db_ref, de_ref, da_ref, dc_ref, dhm_sc,
                        *, blank: int, T: int, U: int, BT: int, BU: int,
                        BV: int, VV: int):
    """V-blocked backward, input half: d_h accumulated across V-blocks in
    VMEM scratch, folded into d_a / d_c on the last block."""
    n = pl.program_id(0)
    ti = pl.program_id(1)
    vi = pl.program_id(2)

    @pl.when(vi == 0)
    def _():
        da_ref[:] = jnp.zeros_like(da_ref)
        dhm_sc[:] = jnp.zeros_like(dhm_sc)

    @pl.when((ti == 0) & (vi == 0))
    def _():
        dc_ref[:] = jnp.zeros_like(dc_ref)

    live = ti * BT < xn_ref[n]

    @pl.when(live)
    def _():
        a = a_ref[0]
        c = c_ref[0]
        h = jnp.tanh(a[:, None, :] + c[None, :, :])
        hm = h.reshape(BT * BU, -1).astype(jnp.bfloat16)
        w = w_ref[:]
        z = jax.lax.dot_general(
            hm, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[0][None, :]
        z3 = z.reshape(BT, BU, BV)
        t_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, BU), 0) + ti * BT
        u_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, BU), 1)
        valid = (t_iota < T) & (u_iota < U)
        db = jnp.where(valid, db_ref[0], 0.0)
        de = jnp.where(valid, de_ref[0], 0.0)
        sm = jnp.exp(z3 - logz_ref[0][..., None])
        v_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, BU, BV), 2) + vi * BV
        lab = lab_ref[0].reshape(1, BU, 1)
        dz3 = (
            db[..., None] * (v_iota == blank)
            + de[..., None] * (v_iota == lab)
            - sm * (db + de)[..., None]
        )  # invalid cells: db/de masked to zero -> dz3 exactly zero
        dz = dz3.reshape(BT * BU, BV)
        dhm_sc[:] += jax.lax.dot_general(
            dz.astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when((vi == VV - 1) & live)
    def _():
        a = a_ref[0]
        c = c_ref[0]
        h = jnp.tanh(a[:, None, :] + c[None, :, :])
        dpre = dhm_sc[:].reshape(BT, BU, -1) * (1.0 - h * h)
        da_ref[0] = jnp.sum(dpre, axis=1)
        dc_ref[0] += jnp.sum(dpre, axis=0)


def _bwd_dwdb_kernel_vb(xn_ref, yn_ref, a_ref, c_ref, w_ref, b_ref, lab_ref,
                        logz_ref, db_ref, de_ref, dw_ref, dbias_ref,
                        *, blank: int, T: int, U: int, BT: int, BU: int,
                        BV: int, VV: int):
    """V-blocked backward, weight half: grid is (VV, N, TT) so each (H, BV)
    d_W block stays VMEM-resident across the whole lattice and is flushed
    exactly once — no revisit-after-flush hazard."""
    vi = pl.program_id(0)
    n = pl.program_id(1)
    ti = pl.program_id(2)

    @pl.when((n == 0) & (ti == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    live = ti * BT < xn_ref[n]

    @pl.when(live)
    def _():
        a = a_ref[0]
        c = c_ref[0]
        h = jnp.tanh(a[:, None, :] + c[None, :, :])
        hm = h.reshape(BT * BU, -1).astype(jnp.bfloat16)
        z = jax.lax.dot_general(
            hm, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[0][None, :]
        z3 = z.reshape(BT, BU, BV)
        t_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, BU), 0) + ti * BT
        u_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, BU), 1)
        valid = (t_iota < T) & (u_iota < U)
        db = jnp.where(valid, db_ref[0], 0.0)
        de = jnp.where(valid, de_ref[0], 0.0)
        sm = jnp.exp(z3 - logz_ref[0][..., None])
        v_iota = jax.lax.broadcasted_iota(jnp.int32, (BT, BU, BV), 2) + vi * BV
        lab = lab_ref[0].reshape(1, BU, 1)
        dz3 = (
            db[..., None] * (v_iota == blank)
            + de[..., None] * (v_iota == lab)
            - sm * (db + de)[..., None]
        )  # invalid cells: db/de masked to zero -> dz3 exactly zero
        dz = dz3.reshape(BT * BU, BV)
        dw_ref[:] += jax.lax.dot_general(
            hm, dz.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbias_ref[0] += jnp.sum(dz, axis=0)


def joint_lattice_fwd(a, c, w, b, labels_ext, xn, yn, blank: int,
                      interpret: bool | None = None):
    """(a, c, W, b) -> (blank_logit, emit_logit, logZ), each (N, T, U) fp32.

    a (N, T, H) fp32, c (N, U, H) fp32, w (H, V), b (V,),
    labels_ext (N, U) int32 (label of row u, blank on the last row).
    xn (N,) int32 lengths drive the ragged tile skip: t-tiles past a
    sample's xn do no MXU work and emit zeros (the loss core masks those
    cells anyway).
    """
    if interpret is None:
        interpret = _interpret()
    N, T, H = a.shape
    U = labels_ext.shape[1]
    V = w.shape[1]
    BT, BU = _tiles(T, U)
    TC, UC = _round_up(T, BT), BU
    a_p = _pad_to(a.astype(jnp.float32), 1, TC)
    c_p = _pad_to(c.astype(jnp.float32), 1, UC)
    # labels ride as (N, UC, 1) so the block's minor dims satisfy Mosaic's
    # (8, 128)-or-full-dim tiling rule
    lab_p = _pad_to(labels_ext.astype(jnp.int32), 1, UC)[..., None]
    BV = _select_bv(T, U, H, V)
    common_in = [
        pl.BlockSpec((1, BT, H), lambda n, t, *_: (n, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BU, H), lambda n, t, *_: (n, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    lab_in = pl.BlockSpec((1, BU, 1), lambda n, t, *_: (n, 0, 0),
                          memory_space=pltpu.VMEM)
    if BV is None:
        kernel = functools.partial(
            _fwd_kernel, blank=blank, T=T, U=U, BT=BT, BU=BU
        )
        grid = (N, TC // BT)
        w16 = w.astype(jnp.bfloat16)
        b32 = b.astype(jnp.float32).reshape(1, V)
        lat_out = pl.BlockSpec((1, BT, BU), lambda n, t, *_: (n, t, 0),
                               memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=common_in + [
                pl.BlockSpec((H, V), lambda n, t, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, V), lambda n, t, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                lab_in,
            ],
            out_specs=[lat_out, lat_out, lat_out],
        )
    else:
        w_p, b_p, Vp = _pad_vocab(w, b, BV)
        VV = Vp // BV
        kernel = functools.partial(
            _fwd_kernel_vb, blank=blank, T=T, U=U, BT=BT, BU=BU, BV=BV, VV=VV
        )
        grid = (N, TC // BT, VV)
        w16 = w_p.astype(jnp.bfloat16)
        b32 = b_p.astype(jnp.float32).reshape(1, Vp)
        lat_out = pl.BlockSpec((1, BT, BU), lambda n, t, v, *_: (n, t, 0),
                               memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, BT, H), lambda n, t, v, *_: (n, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BU, H), lambda n, t, v, *_: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, BV), lambda n, t, v, *_: (0, v),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BV), lambda n, t, v, *_: (0, v),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BU, 1), lambda n, t, v, *_: (n, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[lat_out, lat_out, lat_out],
            scratch_shapes=[
                pltpu.VMEM((BT, BU), jnp.float32),
                pltpu.VMEM((BT, BU), jnp.float32),
                pltpu.VMEM((BT, BU), jnp.float32),
                pltpu.VMEM((BT, BU), jnp.float32),
            ],
        )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, TC, UC), jnp.float32),
            jax.ShapeDtypeStruct((N, TC, UC), jnp.float32),
            jax.ShapeDtypeStruct((N, TC, UC), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * TC * UC * H * V,
            bytes_accessed=N * TC * UC * 12 + H * V * 2,
            transcendentals=N * TC * UC * (H + V),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xn.astype(jnp.int32), yn.astype(jnp.int32), a_p, c_p, w16, b32, lab_p)
    bl, el, lz = (o[:, :T, :U] for o in out)
    return bl, el, lz


def joint_lattice_bwd(a, c, w, b, labels_ext, xn, yn, logz, db, de, blank: int,
                      interpret: bool | None = None):
    """Backward of the fused joint lattice: returns (d_a, d_c, d_w, d_b)."""
    if interpret is None:
        interpret = _interpret()
    N, T, H = a.shape
    U = labels_ext.shape[1]
    V = w.shape[1]
    BT, BU = _tiles(T, U)
    TC, UC = _round_up(T, BT), BU
    a_p = _pad_to(a.astype(jnp.float32), 1, TC)
    c_p = _pad_to(c.astype(jnp.float32), 1, UC)
    lab_p = _pad_to(labels_ext.astype(jnp.int32), 1, UC)[..., None]
    logz_p = _pad_to(_pad_to(logz, 1, TC), 2, UC)
    db_p = _pad_to(_pad_to(db.astype(jnp.float32), 1, TC), 2, UC)
    de_p = _pad_to(_pad_to(de.astype(jnp.float32), 1, TC), 2, UC)
    xn32, yn32 = xn.astype(jnp.int32), yn.astype(jnp.int32)
    BV = _select_bv(T, U, H, V)
    cost = pl.CostEstimate(
        flops=6 * N * TC * UC * H * V,
        bytes_accessed=N * TC * UC * 24 + H * V * 6,
        transcendentals=N * TC * UC * (H + V),
    )
    cparams = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)

    if BV is None:
        w16 = w.astype(jnp.bfloat16)
        b32 = b.astype(jnp.float32).reshape(1, V)
        kernel = functools.partial(
            _bwd_kernel, blank=blank, T=T, U=U, BT=BT, BU=BU
        )
        grid = (N, TC // BT)
        lat = pl.BlockSpec((1, BT, BU), lambda n, t, *_: (n, t, 0),
                           memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, BT, H), lambda n, t, *_: (n, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BU, H), lambda n, t, *_: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, V), lambda n, t, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, V), lambda n, t, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BU, 1), lambda n, t, *_: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                lat, lat, lat,
            ],
            out_specs=[
                pl.BlockSpec((1, BT, H), lambda n, t, *_: (n, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, UC, H), lambda n, t, *_: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, V), lambda n, t, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, V), lambda n, t, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
        )
        da, dc, dw, dbias = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((N, TC, H), jnp.float32),
                jax.ShapeDtypeStruct((N, UC, H), jnp.float32),
                jax.ShapeDtypeStruct((H, V), jnp.float32),
                jax.ShapeDtypeStruct((1, V), jnp.float32),
            ],
            cost_estimate=cost,
            compiler_params=cparams,
            interpret=interpret,
        )(xn32, yn32, a_p, c_p, w16, b32, lab_p, logz_p, db_p, de_p)
        return da[:, :T], dc[:, :U], dw, dbias.reshape(V)

    # ---- V-blocked backward: two kernels (da/dc, then dw/db) ----------------
    w_p, b_p, Vp = _pad_vocab(w, b, BV)
    VV = Vp // BV
    w16 = w_p.astype(jnp.bfloat16)
    b32 = b_p.astype(jnp.float32).reshape(1, Vp)
    lat3 = pl.BlockSpec((1, BT, BU), lambda n, t, v, *_: (n, t, 0),
                        memory_space=pltpu.VMEM)
    in_specs3 = [
        pl.BlockSpec((1, BT, H), lambda n, t, v, *_: (n, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BU, H), lambda n, t, v, *_: (n, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H, BV), lambda n, t, v, *_: (0, v),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BV), lambda n, t, v, *_: (0, v),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BU, 1), lambda n, t, v, *_: (n, 0, 0),
                     memory_space=pltpu.VMEM),
        lat3, lat3, lat3,
    ]
    operands = (xn32, yn32, a_p, c_p, w16, b32, lab_p, logz_p, db_p, de_p)
    da, dc = pl.pallas_call(
        functools.partial(_bwd_dadc_kernel_vb, blank=blank, T=T, U=U,
                          BT=BT, BU=BU, BV=BV, VV=VV),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(N, TC // BT, VV),
            in_specs=in_specs3,
            out_specs=[
                pl.BlockSpec((1, BT, H), lambda n, t, v, *_: (n, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, UC, H), lambda n, t, v, *_: (n, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((BT * BU, H), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((N, TC, H), jnp.float32),
            jax.ShapeDtypeStruct((N, UC, H), jnp.float32),
        ],
        cost_estimate=cost,
        compiler_params=cparams,
        interpret=interpret,
    )(*operands)
    lat_w = pl.BlockSpec((1, BT, BU), lambda v, n, t, *_: (n, t, 0),
                         memory_space=pltpu.VMEM)
    dw, dbias = pl.pallas_call(
        functools.partial(_bwd_dwdb_kernel_vb, blank=blank, T=T, U=U,
                          BT=BT, BU=BU, BV=BV, VV=VV),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(VV, N, TC // BT),
            in_specs=[
                pl.BlockSpec((1, BT, H), lambda v, n, t, *_: (n, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BU, H), lambda v, n, t, *_: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, BV), lambda v, n, t, *_: (0, v),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BV), lambda v, n, t, *_: (0, v),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BU, 1), lambda v, n, t, *_: (n, 0, 0),
                             memory_space=pltpu.VMEM),
                lat_w, lat_w, lat_w,
            ],
            out_specs=[
                pl.BlockSpec((H, BV), lambda v, n, t, *_: (0, v),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BV), lambda v, n, t, *_: (0, v),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((H, Vp), jnp.float32),
            jax.ShapeDtypeStruct((1, Vp), jnp.float32),
        ],
        cost_estimate=cost,
        compiler_params=cparams,
        interpret=interpret,
    )(*operands)
    return da[:, :T], dc[:, :U], dw[:, :V], dbias.reshape(Vp)[:V]


def _labels_ext(labels, blank, N):
    return jnp.concatenate(
        [labels.astype(jnp.int32), jnp.full((N, 1), blank, jnp.int32)], axis=1
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_joint_core(a, c, w, b, labels, xn, yn, blank=0,
                     fastemit_lambda=0.0, impl="auto", interpret=None):
    """Per-sample RNN-T costs straight from the projected joint halves.

    a (N, T, H), c (N, U, H) fp32; w (H, V), b (V,); labels (N, U-1) int32.
    Differentiable w.r.t. (a, c, w, b); the (N, T, U, V) logits tensor is
    never materialized (forward or backward).

    interpret: static; None = decide from the runtime backend, True/False
    force the Pallas interpreter / Mosaic lowering.  Cross-platform callers
    (jax2tf single-platform serialization, `bindings/tf_binding.py`) pass it
    explicitly so a conversion targeting tpu embeds the real kernels even
    when traced on a cpu host.
    """
    from warp_rnnt_tpu.functional.core import _costs_only

    N = a.shape[0]
    lab = _labels_ext(labels, blank, N)
    bl, el, lz = joint_lattice_fwd(a, c, w, b, lab, xn, yn, blank,
                                   interpret=interpret)
    return _costs_only(bl - lz, el - lz, xn, yn, impl)


def _fj_fwd(a, c, w, b, labels, xn, yn, blank, fastemit_lambda, impl,
            interpret):
    from warp_rnnt_tpu.functional.core import _forward_backward

    N = a.shape[0]
    lab = _labels_ext(labels, blank, N)
    bl, el, lz = joint_lattice_fwd(a, c, w, b, lab, xn, yn, blank,
                                   interpret=interpret)
    costs, g_blank, g_emit, _, _ = _forward_backward(
        bl - lz, el - lz, xn, yn, fastemit_lambda, impl
    )
    return costs, (a, c, w, b, lab, xn, yn, lz, g_blank, g_emit)


def _fj_bwd(blank, fastemit_lambda, impl, interpret, res, ct):
    a, c, w, b, lab, xn, yn, lz, g_blank, g_emit = res
    ctb = ct[:, None, None].astype(jnp.float32)
    db = ctb * g_blank
    de = ctb * g_emit
    da, dc, dw, dbias = joint_lattice_bwd(
        a, c, w, b, lab, xn, yn, lz, db, de, blank, interpret=interpret
    )
    return (da.astype(a.dtype), dc.astype(c.dtype), dw.astype(w.dtype),
            dbias.astype(b.dtype), None, None, None)


fused_joint_core.defvjp(_fj_fwd, _fj_bwd)


def rnnt_loss_fused_joint(
    f, g, params, labels, frames_lengths, labels_lengths,
    average_frames: bool = False, reduction=None, blank: int = 0,
    fastemit_lambda: float = 0.0, impl: str = "auto", mode: str = "add",
    interpret: bool | None = None,
):
    """End-to-end fused joint + RNN-T loss.

    f (N, T, F) encoder outputs, g (N, U, F') predictor outputs, and the
    joint parameters: ``params = dict(w_pre, b_pre, w_out, b_out)`` matching
    the Tanh-MLP joint (`warp_rnnt_tpu.models.joint.Joint`): combine ->
    dense(H) -> tanh -> dense(V).  "add" mode: w_pre (F, H) applied to both
    halves; "concat": w_pre (F+F', H) split into row blocks per half.

    The pre-projections run as plain XLA matmuls (O(H^2), negligible); the
    V-projection + logsumexp + blank/label extraction run inside the Pallas
    kernel, so the (N, T, U, V) logits tensor never exists.  Beyond-reference
    capability: the reference requires materialized log-probs
    (`README.md:59`).
    """
    if reduction not in (None, "none", "mean", "sum"):
        raise ValueError(
            f"Unknown reduction method: {reduction}, expected to be one of"
            " ['mean', 'sum', 'none']"
        )
    w_pre, b_pre = params["w_pre"], params["b_pre"]
    w_out, b_out = params["w_out"], params["b_out"]
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
    xn = jnp.asarray(frames_lengths, jnp.int32)
    yn = jnp.asarray(labels_lengths, jnp.int32)
    # Oversized (LLM-scale) vocabularies transparently route to the
    # V-grid-blocked kernels inside joint_lattice_fwd/bwd (_select_bv) —
    # the logits tensor never exists in HBM at ANY vocabulary size.
    costs = fused_joint_core(
        a, c, w_out, b_out, labels, xn, yn, blank, fastemit_lambda, impl,
        interpret,
    )
    if average_frames:
        costs = costs / xn.astype(costs.dtype)
    if reduction in (None, "none"):
        return costs
    return costs.sum() if reduction == "sum" else costs.mean()
