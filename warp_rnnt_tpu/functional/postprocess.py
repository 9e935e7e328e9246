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

import os

import jax
import jax.numpy as jnp

from warp_rnnt_tpu.utils.lse import NEG_INF


def _canary_debug_enabled() -> bool:
    """Opt-in observability for the forward/backward consistency check
    (read at trace time; set WARP_RNNT_DEBUG=1 before building the jit)."""
    return os.environ.get("WARP_RNNT_DEBUG", "") not in ("", "0", "false", "False")


def loglik_forward_backward(blank_lp, alphas, betas, xn, yn):
    """Terminal forward log-likelihood and backward log-likelihood per sample
    (reference `core.cu:343-352`)."""
    n_iota = jnp.arange(blank_lp.shape[0])
    ll_b = betas[:, 0, 0]
    ll_f = alphas[n_iota, xn - 1, yn] + blank_lp[n_iota, xn - 1, yn]
    return ll_f, ll_b


def mismatch_mask(blank_lp, alphas, betas, xn, yn):
    """Boolean (N,) mask of samples whose forward/backward log-likelihoods
    disagree by >0.1% — the numerical canary (reference `core.cu:343-369`).
    Flagged samples get zero gradients and an averaged cost."""
    ll_f, ll_b = loglik_forward_backward(blank_lp, alphas, betas, xn, yn)
    ratio = jnp.abs(ll_f - ll_b) / jnp.abs(jnp.maximum(ll_f, ll_b))
    return ratio > 0.001


def costs_and_grads(blank_lp, emit_lp, alphas, betas, xn, yn, fastemit_lambda):
    """All inputs (N, T, U) fp32 (alphas/betas may use a large negative
    sentinel instead of -inf at invalid cells).  Returns
    (costs (N,), grad_blank (N,T,U), grad_emit (N,T,U))."""
    N, T, U = blank_lp.shape
    dtype = blank_lp.dtype

    ll_f, ll_b = loglik_forward_backward(blank_lp, alphas, betas, xn, yn)
    ratio = jnp.abs(ll_f - ll_b) / jnp.abs(jnp.maximum(ll_f, ll_b))
    bad = ratio > 0.001
    costs = jnp.where(bad, -(ll_f + ll_b) * 0.5, -ll_b)

    if _canary_debug_enabled():
        # Reference observability (`core.cu:353-354`): warn, naming the
        # samples, before zeroing their grads.  jax.debug.print survives jit.
        def _warn(b=bad, f=ll_f, lb=ll_b):
            jax.debug.print(
                "warp_rnnt_tpu WARNING: forward/backward mismatch — grads"
                " zeroed and cost averaged for flagged samples."
                " mask={m} ll_forward={f} ll_backward={b}",
                m=b, f=f, b=lb,
            )

        jax.lax.cond(jnp.any(bad), _warn, lambda: None)

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
