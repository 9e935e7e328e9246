"""Shared cost/gradient post-processing from lattice scores.

Both backends (pure-JAX scan, Pallas TPU kernels) produce alphas/betas; the
gradient formulas and the forward/backward consistency check are identical
XLA elementwise code (the compiler fuses this into a handful of HBM passes),
so they live here once.

Semantics (reference `core.cu:260-370`):
  * blank grad  -exp(alpha + blank_lp + beta[t+1,u] - ll), beta dropped at the
    terminal cell (xn-1, yn); zero at (t = xn-1, u < yn) and outside the
    valid region.
  * label grad  -(1+lambda) * exp(alpha + emit_lp + beta[t,u+1] - ll).
  * consistency: ll_f = alpha[xn-1, yn] + blank_lp[xn-1, yn] vs ll_b =
    beta[0,0]; if |ll_f-ll_b|/|max(ll_f,ll_b)| > 0.001 the sample's grads are
    zeroed and its cost becomes -(ll_f+ll_b)/2.
"""

from __future__ import annotations

import jax.numpy as jnp

from warp_rnnt_tpu.utils.lse import NEG_INF


def costs_and_grads(blank_lp, emit_lp, alphas, betas, xn, yn, fastemit_lambda):
    """All inputs (N, T, U) fp32 (alphas/betas may use a large negative
    sentinel instead of -inf at invalid cells).  Returns
    (costs (N,), grad_blank (N,T,U), grad_emit (N,T,U))."""
    N, T, U = blank_lp.shape
    dtype = blank_lp.dtype

    n_iota = jnp.arange(N)
    ll_b = betas[:, 0, 0]
    ll_f = alphas[n_iota, xn - 1, yn] + blank_lp[n_iota, xn - 1, yn]

    ratio = jnp.abs(ll_f - ll_b) / jnp.abs(jnp.maximum(ll_f, ll_b))
    bad = ratio > 0.001
    costs = jnp.where(bad, -(ll_f + ll_b) * 0.5, -ll_b)

    t_iota = jnp.arange(T)[None, :, None]
    u_iota = jnp.arange(U)[None, None, :]
    xn_b = xn[:, None, None]
    yn_b = yn[:, None, None]
    terminal = (t_iota == xn_b - 1) & (u_iota == yn_b)

    ll = ll_b[:, None, None]
    beta_t1 = jnp.concatenate(
        [betas[:, 1:, :], jnp.full((N, 1, U), NEG_INF, dtype)], axis=1
    )
    beta_u1 = jnp.concatenate(
        [betas[:, :, 1:], jnp.full((N, T, 1), NEG_INF, dtype)], axis=2
    )

    occ_blank = alphas + blank_lp + jnp.where(terminal, 0.0, beta_t1) - ll
    grad_blank = jnp.where(
        (t_iota < xn_b) & (u_iota <= yn_b), -jnp.exp(occ_blank), 0.0
    )

    occ_emit = alphas + emit_lp + beta_u1 - ll
    grad_emit = jnp.where(
        (t_iota < xn_b) & (u_iota < yn_b),
        -(1.0 + fastemit_lambda) * jnp.exp(occ_emit),
        0.0,
    )

    keep = jnp.where(bad, 0.0, 1.0)[:, None, None]
    return costs, grad_blank * keep, grad_emit * keep
