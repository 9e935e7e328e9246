"""Pallas TPU kernels for the RNN-T lattice sweeps.

TPU-native replacement for the reference's warp-pipelined CUDA kernels
(`core.cu:41-246`, `core_gather.cu`): no spin-lock counts array, no warps.
The lattice is swept column-by-column (grid over U, sequential on a
TensorCore); each column's in-T dependency

    alpha[t, u] = LSE(alpha[t-1, u] + blank[t-1, u], alpha[t, u-1] + emit[t, u-1])

is a log-space first-order linear recurrence solved in-register with a
Hillis-Steele doubling scan over the lane dimension (log2(T) steps of
`pltpu.roll` + logaddexp on the VPU) — the TPU analogue of the reference's
`__shfl_up_sync` warp scans (`core.cu:99-131`).  Alpha and beta sweeps run
FUSED in the same grid step (alpha walks u upward while beta walks U-1-u
downward), mirroring `kernel_warp`'s two cooperating warp groups
(`core.cu:248-258`) but without any cross-thread synchronization: the column
carries live in VMEM scratch that persists across sequential grid steps.

Memory layout: lattices are transposed to (U, N, T) so each grid step's
blocks are (1, N_pad, T_pad) tiles — N on sublanes, T on lanes.  All DP math
is fp32.  -inf is replaced by a large negative sentinel (NEG) to keep the VPU
NaN-free; exp() underflows it to exactly 0 downstream.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from warp_rnnt_tpu.functional.postprocess import costs_and_grads

NEG = -1.0e30
# v5e has 128 MB of VMEM; leave headroom for the compiler's own scratch.
_VMEM_LIMIT = 64 << 20


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lae(a, b):
    """logaddexp on finite sentinel values (never sees true -inf)."""
    mx = jnp.maximum(a, b)
    return mx + jnp.log1p(jnp.exp(-jnp.abs(a - b)))


def _shift_right(x, k, fill):
    t = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(t < k, fill, pltpu.roll(x, shift=k, axis=1))


def _shift_left(x, k, fill):
    t = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    T = x.shape[1]
    # pltpu.roll requires non-negative shifts: left-by-k == right-by-(T-k)
    return jnp.where(t >= T - k, fill, pltpu.roll(x, shift=T - k, axis=1))


def _scan_fwd(m, b, T_pad):
    """Inclusive solve of a[t] = LSE(a[t-1] + m[t], b[t]) over lanes."""
    k = 1
    while k < T_pad:
        ms = _shift_right(m, k, 0.0)
        bs = _shift_right(b, k, NEG)
        b = _lae(bs + m, b)
        m = ms + m
        k *= 2
    return b


def _scan_bwd(m, b, T_pad):
    """Inclusive solve of a[t] = LSE(a[t+1] + m[t], b[t]) over lanes.

    Suffix segments combine as (M_l, B_l) . (M_r, B_r) =
    (M_l + M_r, LSE(B_l, M_l + B_r)).
    """
    k = 1
    while k < T_pad:
        ms = _shift_left(m, k, 0.0)
        bs = _shift_left(b, k, NEG)
        b = _lae(b, m + bs)
        m = m + ms
        k *= 2
    return b


def _beta_block(xn_ref, yn_ref, blank_b_ref, emit_b_ref, beta_out_ref,
                beta_c_ref, U_blk: int, BU: int, T_pad: int):
    """Shared beta body: BU columns u = U_blk-1 - (g*BU + k), k = 0..BU-1.

    The carry scratch must be initialized to NEG at g == 0 by the caller.
    Columns >= the true U are NEG-padded input; they propagate a NEG carry
    and are sliced off by the host wrapper.
    """
    g = pl.program_id(0)
    BN = beta_c_ref.shape[0]
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (BN, T_pad), 1)
    xn = xn_ref[:, 0:1]
    yn = yn_ref[:, 0:1]
    valid_t = t_iota < xn
    terminal_t = t_iota == xn - 1

    for k in range(BU):
        u_b = U_blk - 1 - (g * BU + k)
        blank_col_b = blank_b_ref[BU - 1 - k]
        emit_col_b = emit_b_ref[BU - 1 - k]
        terminal = terminal_t & (u_b == yn)
        emit_ok_b = (u_b < yn) & valid_t
        b = jnp.where(
            terminal,
            blank_col_b,
            jnp.where(emit_ok_b, emit_col_b + beta_c_ref[:, :], NEG),
        )
        beta_col = _scan_bwd(blank_col_b, b, T_pad)
        beta_c_ref[:, :] = beta_col
        beta_out_ref[BU - 1 - k] = beta_col


def _beta_only_kernel(xn_ref, yn_ref, blank_b_ref, emit_b_ref, beta_out_ref,
                      beta_c_ref, *, U_blk: int, BU: int, T_pad: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        beta_c_ref[:, :] = jnp.full_like(beta_c_ref[:, :], NEG)

    _beta_block(xn_ref, yn_ref, blank_b_ref, emit_b_ref, beta_out_ref,
                beta_c_ref, U_blk, BU, T_pad)


def _fused_kernel(
    xn_ref, yn_ref,
    blank_a_ref, emit_a_ref, emit_ap_ref, blank_b_ref, emit_b_ref,
    alpha_out_ref, beta_out_ref,
    alpha_c_ref, beta_c_ref,
    *, U_blk: int, BU: int, T_pad: int,
):
    g = pl.program_id(0)
    BN = alpha_c_ref.shape[0]

    @pl.when(g == 0)
    def _():
        alpha_c_ref[:, :] = jnp.full_like(alpha_c_ref[:, :], NEG)
        beta_c_ref[:, :] = jnp.full_like(beta_c_ref[:, :], NEG)

    t_iota = jax.lax.broadcasted_iota(jnp.int32, (BN, T_pad), 1)
    xn = xn_ref[:, 0:1]  # (BN, 1)
    yn = yn_ref[:, 0:1]
    valid_t = t_iota < xn

    # ---- beta columns (descending), run every step ------------------------
    _beta_block(xn_ref, yn_ref, blank_b_ref, emit_b_ref, beta_out_ref,
                beta_c_ref, U_blk, BU, T_pad)

    # ---- alpha columns (ascending) ----------------------------------------
    seed = jnp.where(t_iota == 0, 0.0, NEG)
    for k in range(BU):
        u_a = g * BU + k
        blank_col_a = blank_a_ref[k]
        # emit column u-1: inside the block for k >= 1, last column of the
        # previous block for k == 0 (the g == 0 read is masked by the seed).
        emit_prev_a = emit_a_ref[k - 1] if k >= 1 else emit_ap_ref[BU - 1]
        emit_ok_a = ((u_a - 1) < yn) & valid_t
        b_a = jnp.where(
            u_a == 0,
            seed,
            jnp.where(emit_ok_a, alpha_c_ref[:, :] + emit_prev_a, NEG),
        )
        m_a = _shift_right(blank_col_a, 1, 0.0)
        alpha_col = _scan_fwd(m_a, b_a, T_pad)
        alpha_c_ref[:, :] = alpha_col
        alpha_out_ref[k] = alpha_col


def _choose_bu(U: int, N_pad: int, T_pad: int) -> int:
    """Columns per grid step: fewer sequential grid steps and larger DMA
    chunks.  The VMEM footprint is ~18 slabs of (BU, N_pad, T_pad) fp32
    (7 input + 2 output block streams, double-buffered) + 2 carries; the
    pallas_call raises `vmem_limit_bytes` to _VMEM_LIMIT (the default 16 MB
    scoped limit rejects even BU=1 at N_pad=128, T_pad=1536)."""
    budget = int(_VMEM_LIMIT * 0.75)
    bu = budget // (18 * N_pad * T_pad * 4)
    return max(1, min(int(bu), 8, U))


def alpha_beta(blank_lp, emit_lp, xn, yn, compute_alpha: bool = True,
               interpret: bool | None = None):
    """Run the fused column sweep.  Inputs/outputs (N, T, U) fp32.

    Returns (alphas, betas); alphas is None when ``compute_alpha=False`` —
    the beta-only inference path.

    ``interpret=None`` auto-selects by the trace-time default backend;
    pass False to force Mosaic compilation regardless (required when
    cross-platform lowering for TPU from a CPU host, e.g. the multi-platform
    jax.export behind the TF graph op — trace-time backend checks see the
    host there, not the target).
    """
    N, T, U = blank_lp.shape
    N_pad = _round_up(max(N, 8), 8)
    T_pad = _round_up(max(T, 128), 128)
    BU = _choose_bu(U, N_pad, T_pad)
    G = -(-U // BU)
    U_blk = G * BU

    blank_ut = jnp.full((U_blk, N_pad, T_pad), NEG, jnp.float32)
    blank_ut = blank_ut.at[:U, :N, :T].set(
        jnp.moveaxis(blank_lp.astype(jnp.float32), 2, 0)
    )
    emit_ut = jnp.full((U_blk, N_pad, T_pad), NEG, jnp.float32)
    emit_ut = emit_ut.at[:U, :N, :T].set(
        jnp.moveaxis(emit_lp.astype(jnp.float32), 2, 0)
    )
    # padded samples get a valid 1x1 lattice so no NaN can arise
    xn_col = jnp.concatenate(
        [xn.astype(jnp.int32), jnp.ones((N_pad - N,), jnp.int32)]
    )[:, None]
    yn_col = jnp.concatenate(
        [yn.astype(jnp.int32), jnp.zeros((N_pad - N,), jnp.int32)]
    )[:, None]

    blk = pl.BlockSpec(
        (BU, N_pad, T_pad), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
    )
    blk_prev = pl.BlockSpec(
        (BU, N_pad, T_pad),
        lambda g: (jnp.maximum(g - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    blk_rev = pl.BlockSpec(
        (BU, N_pad, T_pad), lambda g: (G - 1 - g, 0, 0),
        memory_space=pltpu.VMEM,
    )
    len_block = pl.BlockSpec(
        (N_pad, 1), lambda g: (0, 0), memory_space=pltpu.VMEM
    )

    sweeps = 2 if compute_alpha else 1
    flops_scan = sweeps * U_blk * N_pad * T_pad * (int(math.log2(T_pad)) + 1) * 8
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    common = dict(
        grid=(G,),
        cost_estimate=pl.CostEstimate(
            flops=flops_scan,
            bytes_accessed=sweeps * U_blk * N_pad * T_pad * 4 * 8,
            transcendentals=sweeps * U_blk * N_pad * T_pad
            * (int(math.log2(T_pad)) + 1),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )
    if compute_alpha:
        kernel = functools.partial(
            _fused_kernel, U_blk=U_blk, BU=BU, T_pad=T_pad
        )
        alphas_ut, betas_ut = pl.pallas_call(
            kernel,
            in_specs=[len_block, len_block, blk, blk, blk_prev,
                      blk_rev, blk_rev],
            out_specs=[blk, blk_rev],
            out_shape=[
                jax.ShapeDtypeStruct((U_blk, N_pad, T_pad), jnp.float32),
                jax.ShapeDtypeStruct((U_blk, N_pad, T_pad), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((N_pad, T_pad), jnp.float32),
                pltpu.VMEM((N_pad, T_pad), jnp.float32),
            ],
            **common,
        )(xn_col, yn_col, blank_ut, emit_ut, emit_ut, blank_ut, emit_ut)
        alphas = jnp.moveaxis(alphas_ut[:U, :N, :T], 0, 2)
    else:
        # beta-only inference: no alpha input streams, outputs, or scratch
        beta_kernel = functools.partial(
            _beta_only_kernel, U_blk=U_blk, BU=BU, T_pad=T_pad
        )
        betas_ut = pl.pallas_call(
            beta_kernel,
            in_specs=[len_block, len_block, blk_rev, blk_rev],
            out_specs=blk_rev,
            out_shape=jax.ShapeDtypeStruct((U_blk, N_pad, T_pad), jnp.float32),
            scratch_shapes=[pltpu.VMEM((N_pad, T_pad), jnp.float32)],
            **common,
        )(xn_col, yn_col, blank_ut, emit_ut)
        alphas = None

    betas = jnp.moveaxis(betas_ut[:U, :N, :T], 0, 2)
    return alphas, betas


def forward_backward(blank_lp, emit_lp, xn, yn, fastemit_lambda=0.0,
                     interpret=None):
    """Pallas-backed equivalent of `scan_impl.forward_backward`."""
    blank_lp = blank_lp.astype(jnp.float32)
    emit_lp = emit_lp.astype(jnp.float32)
    alphas, betas = alpha_beta(blank_lp, emit_lp, xn, yn, compute_alpha=True,
                               interpret=interpret)
    costs, g_blank, g_emit = costs_and_grads(
        blank_lp, emit_lp, alphas, betas, xn, yn, fastemit_lambda
    )
    return costs, g_blank, g_emit, alphas, betas


def costs_only(blank_lp, emit_lp, xn, yn, interpret=None):
    """Beta-only inference sweep (reference `core_compact.cu:371-378`)."""
    blank_lp = blank_lp.astype(jnp.float32)
    emit_lp = emit_lp.astype(jnp.float32)
    _, betas = alpha_beta(blank_lp, emit_lp, xn, yn, compute_alpha=False,
                          interpret=interpret)
    return -betas[:, 0, 0]
