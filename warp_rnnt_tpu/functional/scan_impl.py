"""Pure-JAX RNN-Transducer forward-backward (column-scan formulation).

TPU-first re-design of the lattice recursion.  Where the reference CUDA code
pipelines 32-thread warps over the (T, U) lattice with a spin-lock counts
array (`/root/reference/core.cu:41-141`, `README.md:13-19`), here each lattice
column u is computed in ONE shot from column u-1 by solving the in-column
dependency

    alpha[t, u] = LSE(alpha[t-1, u] + blank[t-1, u],  alpha[t, u-1] + emit[t, u-1])

as a log-space first-order linear recurrence along t:

    a[t] = LSE(a[t-1] + m[t], b[t]),   m[t] = blank[t-1, u],
                                       b[t] = alpha[t, u-1] + emit[t, u-1]

solved with `lax.associative_scan` (log2(T) depth, fully vectorized over
N x T lanes).  The outer `lax.scan` walks the U columns.  Total sequential
depth is U * log2(T) VPU stages instead of the T+U wavefront chain; all
arithmetic is fp32 regardless of input dtype.

This module is shape-polymorphic and backend-agnostic (runs on CPU for tests,
TPU under jit); the Pallas kernels in `warp_rnnt_tpu.ops` implement the same
column-scan contract for peak TPU performance.

Inputs are "gathered" lattices: `blank_lp[n, t, u] = log P(blank | t, u)` and
`emit_lp[n, t, u] = log P(y_{u+1} | t, u)`, both (N, T, U) with U = max(yn)+1.
Padded cells may hold arbitrary finite or -inf values; validity is derived
from `xn`/`yn` masks and -inf is fully guarded (the reference's
`logaddexp(-inf, -inf)` NaN hazard, `core.cu:26-39`, does not exist here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from warp_rnnt_tpu.utils.lse import NEG_INF, logrec_combine


def _linrec(m, b):
    """Solve a[t] = LSE(a[t-1] + m[t], b[t]) along the last axis."""
    _, out = lax.associative_scan(logrec_combine, (m, b), axis=-1)
    return out


def compute_alphas(blank_lp, emit_lp, xn, yn):
    """Forward lattice scores.

    Args:
      blank_lp, emit_lp: (N, T, U) fp32 gathered log-probs.
      xn, yn: (N,) int32 valid frame/label counts.

    Returns:
      alphas (N, T, U) fp32; -inf at columns u > yn, garbage-free within the
      valid region.  alpha[n, t, u] for t >= xn[n] is unused downstream.
    """
    N, T, U = blank_lp.shape
    t_iota = jnp.arange(T)[None, :]
    valid_t = t_iota < xn[:, None]  # (N, T)
    seed = jnp.where(t_iota == 0, 0.0, NEG_INF)  # (1, T)

    blank_u = jnp.moveaxis(blank_lp, 2, 0)  # (U, N, T)
    # emit column u-1, aligned to step u (column 0 consumes a dummy).
    emit_prev_u = jnp.concatenate(
        [jnp.full((1, N, T), NEG_INF, blank_lp.dtype),
         jnp.moveaxis(emit_lp, 2, 0)[: U - 1]],
        axis=0,
    )

    def step(alpha_prev, inp):
        u, blank_col, emit_prev_col = inp
        emit_ok = ((u - 1) < yn)[:, None] & valid_t  # (N, T)
        b = jnp.where(
            u == 0,
            jnp.broadcast_to(seed, (N, T)),
            jnp.where(emit_ok, alpha_prev + emit_prev_col, NEG_INF),
        )
        # m[t] = blank[t-1, u]; m[0] is never consumed by the scan.
        m = jnp.concatenate([jnp.zeros((N, 1), blank_col.dtype), blank_col[:, :-1]], axis=1)
        alpha_col = _linrec(m, b)
        return alpha_col, alpha_col

    init = jnp.full((N, T), NEG_INF, blank_lp.dtype)
    _, alphas_u = lax.scan(step, init, (jnp.arange(U), blank_u, emit_prev_u))
    return jnp.moveaxis(alphas_u, 0, 2)


def compute_betas(blank_lp, emit_lp, xn, yn):
    """Backward lattice scores.

    beta[n, t, u] includes the emission out of (t, u); terminal cell
    (xn-1, yn) seeds with its blank log-prob, matching the reference
    convention (`core.cu:171-173`).  Invalid cells are exactly -inf.
    """
    N, T, U = blank_lp.shape
    t_iota = jnp.arange(T)[None, :]
    valid_t = t_iota < xn[:, None]
    terminal_t = t_iota == (xn[:, None] - 1)  # (N, T)

    blank_u = jnp.moveaxis(blank_lp, 2, 0)
    emit_u = jnp.moveaxis(emit_lp, 2, 0)

    def step(beta_next, inp):
        u, blank_col, emit_col = inp
        is_term_u = (u == yn)[:, None]
        emit_ok = (u < yn)[:, None] & valid_t
        b = jnp.where(
            terminal_t & is_term_u,
            blank_col,
            jnp.where(emit_ok, emit_col + beta_next, NEG_INF),
        )
        # Reverse recurrence beta[t] = LSE(beta[t+1] + blank[t], b[t]):
        # flip t, scan forward, flip back.  m_r[k] = blank[T-1-k].
        m_r = jnp.flip(blank_col, axis=1)
        b_r = jnp.flip(b, axis=1)
        beta_col = jnp.flip(_linrec(m_r, b_r), axis=1)
        return beta_col, beta_col

    init = jnp.full((N, T), NEG_INF, blank_lp.dtype)
    _, betas_u = lax.scan(
        step, init, (jnp.arange(U), blank_u, emit_u), reverse=True
    )
    return jnp.moveaxis(betas_u, 0, 2)


def forward_backward(blank_lp, emit_lp, xn, yn, fastemit_lambda=0.0):
    """Full forward-backward: costs + gradients w.r.t. the gathered log-probs.

    Implements the reference training-path semantics exactly:
      * costs[n] = -beta[0, 0]
      * forward/backward consistency check: if |ll_f - ll_b| / |max(ll_f,
        ll_b)| > 0.001 the sample's gradients are zeroed and the cost becomes
        the average of the two (`core.cu:334-370`).
      * blank grad:  -exp(alpha + blank_lp + beta[t+1, u] - ll), beta term
        dropped at the terminal cell; zero at (t == xn-1, u < yn).
      * label grad:  -(1 + fastemit_lambda) * exp(alpha + emit_lp +
        beta[t, u+1] - ll)   (`core.cu:260-332`).

    Returns:
      costs (N,), grad_blank (N, T, U), grad_emit (N, T, U),
      alphas (N, T, U), betas (N, T, U).
    """
    from warp_rnnt_tpu.functional.postprocess import costs_and_grads

    blank_lp = blank_lp.astype(jnp.float32)
    emit_lp = emit_lp.astype(jnp.float32)
    alphas = compute_alphas(blank_lp, emit_lp, xn, yn)
    betas = compute_betas(blank_lp, emit_lp, xn, yn)
    costs, grad_blank, grad_emit = costs_and_grads(
        blank_lp, emit_lp, alphas, betas, xn, yn, fastemit_lambda
    )
    return costs, grad_blank, grad_emit, alphas, betas


def costs_only(blank_lp, emit_lp, xn, yn):
    """Inference fast path: one backward sweep, no gradients.

    Mirrors the reference compact-mode `required_grad=false` optimization
    (`core_compact.cu:371-378`) and extends it to the padded layout.
    """
    blank_lp = blank_lp.astype(jnp.float32)
    emit_lp = emit_lp.astype(jnp.float32)
    betas = compute_betas(blank_lp, emit_lp, xn, yn)
    return -betas[:, 0, 0]
