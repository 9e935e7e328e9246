"""Diagonal-wavefront Pallas kernels (the primary TPU path).

The reference pipelines 32-thread warps over the (T, U) lattice with
spin-locks (`core.cu:41-141`); the column-scan kernel in `pallas_impl.py`
replaces that with associative scans but pays a log2(T) factor of
transcendentals.  This kernel eliminates the log factor by sweeping
ANTI-DIAGONALS — the natural wavefront of the recursion — at exactly one
log-add-exp per lattice cell, the algorithmic speed-of-light for this DP.

Storage is *skewed*: ``S[d, u] = X[t = d - u, u]`` maps diagonal d to a
contiguous slice (built by a pure pad/reshape shear — no gathers), so the
recurrences become one lane-shift of the carried diagonal plus elementwise
LSE:

    alpha_d[u] = LSE(alpha_{d-1}[u] + blank(t-1, u),
                     alpha_{d-1}[u-1] + emit(t, u-1))          (t = d - u)
    beta_d[u]  = LSE(beta_{d+1}[u] + blank(t, u),
                     beta_{d+1}[u+1] + emit(t, u))

All validity masking (per-sample xn/yn, lattice bounds) happens INSIDE the
kernel from iotas + length refs: measured on v5e, XLA fuses iota-compare-
select chains over big arrays pathologically (~50x slower than the same
logic on the VPU in-kernel), so the host side only shears — two reshape
passes — and the kernel consumes raw skewed log-probs.

Alpha (d ascending) and beta (d descending) run fused in the same grid step;
K diagonals are processed per grid step by an inner loop over VMEM-resident
chunks, the carried diagonal and the previous input diagonal (for alpha's
d-1 access) living in VMEM scratch.  Layout: (D, N, U) — diagonal on the
grid axis, batch on sublanes, u on lanes.  fp32; -inf == finite NEG sentinel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from warp_rnnt_tpu.functional.postprocess import costs_and_grads

NEG = -1.0e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lae(a, b):
    mx = jnp.maximum(a, b)
    return mx + jnp.log1p(jnp.exp(-jnp.abs(a - b)))


def _shift_r(x, fill):
    u = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(u < 1, fill, pltpu.roll(x, shift=1, axis=1))


def _shift_l(x, fill):
    U = x.shape[1]
    u = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(u >= U - 1, fill, pltpu.roll(x, shift=U - 1, axis=1))


def _shear(x, D_pad, N_pad, U_pad, fill=NEG):
    """Skew (N, T, U) -> (D_pad, N_pad, U_pad) with S[d, n, u] = x[n, d-u, u].

    Pure pad/reshape/transpose (no gather): in (N, U, W) layout with
    W = T + U, reinterpreting rows with width W-1 shifts row u right by u:
    flat index u*W + t == u*(W-1) + (t + u), i.e. lands at column d = t + u.
    Out-of-range slots read the fill padding.
    """
    N, T, U = x.shape
    W = T + U
    xt = jnp.moveaxis(x, 2, 1)  # (N, U, T)
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, W - T)), constant_values=fill)
    flat = xt.reshape(N, U * W)[:, : U * (W - 1)]
    sk = flat.reshape(N, U, W - 1)  # sk[n, u, d] = x[n, d-u, u]
    sk = sk[:, :, : min(W - 1, D_pad)]
    sk = jnp.moveaxis(sk, 2, 0)  # (D, N, U)
    return jnp.pad(
        sk,
        ((0, D_pad - sk.shape[0]), (0, N_pad - N), (0, U_pad - U)),
        constant_values=fill,
    )


def _unshear(sk, N, T, U):
    """Inverse of _shear: (D_pad, N_pad, U_pad) -> (N, T, U) with
    x[n, t, u] = sk[t+u, n, u], again via pure reshapes."""
    D_pad = sk.shape[0]
    st = jnp.moveaxis(sk[:, :N, :U], 0, 2)  # (N, U, D_pad)
    flat = st.reshape(N, U * D_pad)
    flat = jnp.pad(flat, ((0, 0), (0, U)), constant_values=0.0)
    out = flat.reshape(N, U, D_pad + 1)[:, :, :T]  # out[n,u,t] = sk[t+u,n,u]
    return jnp.moveaxis(out, 1, 2)  # (N, T, U)


def _kernel(
    xn_ref, yn_ref,
    Sb_a_ref, Se_a_ref, Sb_b_ref, Se_b_ref,
    alpha_out_ref, beta_out_ref,
    alpha_c_ref, beta_c_ref, prev_ref,
    *, K: int, G: int, U: int, compute_alpha: bool,
):
    g = pl.program_id(0)
    N_pad, U_pad = beta_c_ref.shape
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (N_pad, U_pad), 1)
    xn = xn_ref[:, 0:1]
    yn = yn_ref[:, 0:1]
    seed_alpha = jnp.where(u_iota < 1, 0.0, NEG)
    neg = jnp.full((N_pad, U_pad), NEG, jnp.float32)
    term_d = xn + yn - 1  # (N_pad, 1) terminal diagonal per sample
    blank_row_ok = (u_iota <= yn) & (u_iota < U)
    emit_row_ok = u_iota < yn

    @pl.when(g == 0)
    def _():
        beta_c_ref[:, :] = neg
        if compute_alpha:
            prev_ref[0] = neg
            prev_ref[1] = neg

    def body(k, _):
        # ---- beta: diagonal d_b descending within the reversed chunk -----
        k_b = K - 1 - k
        d_b = (G - 1 - g) * K + k_b
        t_ok_b = (d_b - u_iota) < xn  # shear fill handles t<0 / t>=T
        b_b = jnp.where(blank_row_ok & t_ok_b, Sb_b_ref[k_b], NEG)
        e_b = jnp.where(emit_row_ok & t_ok_b, Se_b_ref[k_b], NEG)
        carry_b = beta_c_ref[:, :]
        new_b = _lae(carry_b + b_b, _shift_l(carry_b, NEG) + e_b)
        new_b = jnp.where((d_b == term_d) & (u_iota == yn), b_b, new_b)
        beta_c_ref[:, :] = new_b
        beta_out_ref[k_b] = new_b

        # ---- alpha: diagonal d_a ascending; inputs are diag d_a - 1 -------
        if compute_alpha:
            d_a = g * K + k
            t_ok_a = (d_a - 1 - u_iota) < xn
            b_a = jnp.where(blank_row_ok & t_ok_a, prev_ref[0], NEG)
            # emit(t, u-1) = S_emit[d-1][u-1]: lane-shift the previous diag
            e_prev = jnp.where(emit_row_ok & ((d_a - 1 - u_iota) < xn),
                               prev_ref[1], NEG)
            e_a = _shift_r(e_prev, NEG)
            carry_a = alpha_c_ref[:, :]
            new_a = _lae(carry_a + b_a, _shift_r(carry_a, NEG) + e_a)
            new_a = jnp.where(d_a == 0, seed_alpha, new_a)
            alpha_c_ref[:, :] = new_a
            alpha_out_ref[k] = new_a
            prev_ref[0] = Sb_a_ref[k]
            prev_ref[1] = Se_a_ref[k]
        return _

    jax.lax.fori_loop(0, K, body, None, unroll=False)


def _choose_k(N_pad: int, U_pad: int, D: int) -> int:
    bytes_per_diag = N_pad * U_pad * 4
    k = max(8, (1 << 20) // bytes_per_diag)  # ~1MB chunks
    return min(_round_up(k, 8), _round_up(D, 8))


def alpha_beta(blank_lp, emit_lp, xn, yn, compute_alpha: bool = True):
    """Diagonal-wavefront sweep.  Inputs/outputs (N, T, U) fp32."""
    N, T, U = blank_lp.shape
    N_pad = _round_up(max(N, 8), 8)
    U_pad = _round_up(U, 128)
    D = T + U - 1
    K = _choose_k(N_pad, U_pad, D)
    G = -(-D // K)
    D_pad = G * K

    S_blank = _shear(blank_lp.astype(jnp.float32), D_pad, N_pad, U_pad)
    S_emit = _shear(emit_lp.astype(jnp.float32), D_pad, N_pad, U_pad)
    xn_col = jnp.pad(xn.astype(jnp.int32), (0, N_pad - N), constant_values=1)[
        :, None
    ]
    yn_col = jnp.pad(yn.astype(jnp.int32), (0, N_pad - N), constant_values=0)[
        :, None
    ]

    chunk = pl.BlockSpec(
        (K, N_pad, U_pad), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
    )
    chunk_rev = pl.BlockSpec(
        (K, N_pad, U_pad), lambda g: (G - 1 - g, 0, 0), memory_space=pltpu.VMEM
    )
    len_block = pl.BlockSpec(
        (N_pad, 1), lambda g: (0, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _kernel, K=K, G=G, U=U, compute_alpha=compute_alpha
    )
    out_shape = [
        jax.ShapeDtypeStruct((D_pad, N_pad, U_pad), jnp.float32),
        jax.ShapeDtypeStruct((D_pad, N_pad, U_pad), jnp.float32),
    ]
    cells = D_pad * N_pad * U_pad
    alphas_sk, betas_sk = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[len_block, len_block, chunk, chunk, chunk_rev, chunk_rev],
        out_specs=[chunk, chunk_rev],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((N_pad, U_pad), jnp.float32),
            pltpu.VMEM((N_pad, U_pad), jnp.float32),
            pltpu.VMEM((2, N_pad, U_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=cells * 24,
            bytes_accessed=cells * 4 * 6,
            transcendentals=cells * 4,
        ),
        interpret=jax.default_backend() != "tpu",
    )(xn_col, yn_col, S_blank, S_emit, S_blank, S_emit)

    alphas = _unshear(alphas_sk, N, T, U)
    betas = _unshear(betas_sk, N, T, U)
    return alphas, betas


def forward_backward(blank_lp, emit_lp, xn, yn, fastemit_lambda=0.0):
    blank_lp = blank_lp.astype(jnp.float32)
    emit_lp = emit_lp.astype(jnp.float32)
    alphas, betas = alpha_beta(blank_lp, emit_lp, xn, yn, compute_alpha=True)
    costs, g_blank, g_emit = costs_and_grads(
        blank_lp, emit_lp, alphas, betas, xn, yn, fastemit_lambda
    )
    return costs, g_blank, g_emit, alphas, betas


def costs_only(blank_lp, emit_lp, xn, yn):
    blank_lp = blank_lp.astype(jnp.float32)
    emit_lp = emit_lp.astype(jnp.float32)
    _, betas = alpha_beta(blank_lp, emit_lp, xn, yn, compute_alpha=False)
    return -betas[:, 0, 0]
