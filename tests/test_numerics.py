"""Numerical-contract tests: fwd/bwd mismatch diagnostic, bf16-joint/fp32-
lattice recipe, -inf safety."""

import jax
import jax.numpy as jnp
import numpy as np

from warp_rnnt_tpu import rnnt_loss, rnnt_loss_with_internals
from warp_rnnt_tpu.functional.postprocess import costs_and_grads
from warp_rnnt_tpu.utils.lse import NEG_INF, safe_logaddexp

import golden


def test_mismatch_zeroes_grads_and_averages_cost():
    """Reference `kernel_fill_costs` semantics (core.cu:334-370): when
    |ll_f - ll_b| / |max| > 0.001, grads are zeroed and cost = -(a+b)/2."""
    N, T, U = 2, 3, 2
    blank = jnp.full((N, T, U), -1.0, jnp.float32)
    emit = jnp.full((N, T, U), -1.5, jnp.float32)
    alphas = jnp.full((N, T, U), -2.0, jnp.float32)
    betas = jnp.full((N, T, U), -2.0, jnp.float32)
    xn = jnp.array([3, 3], jnp.int32)
    yn = jnp.array([1, 1], jnp.int32)
    # sample 0: consistent (ll_f == ll_b); sample 1: corrupt alphas terminal
    # ll_f = alphas[xn-1, yn] + blank = -2 + -1 = -3; make betas[0,0] = -3
    betas = betas.at[:, 0, 0].set(-3.0)
    alphas = alphas.at[1, 2, 1].set(-10.0)  # sample 1 mismatch: ll_f = -11

    costs, gb, ge = costs_and_grads(blank, emit, alphas, betas, xn, yn, 0.0)
    np.testing.assert_allclose(float(costs[0]), 3.0, rtol=1e-6)
    np.testing.assert_allclose(float(costs[1]), (11.0 + 3.0) / 2, rtol=1e-6)
    assert np.any(np.asarray(gb[0]) != 0)
    np.testing.assert_array_equal(np.asarray(gb[1]), 0)
    np.testing.assert_array_equal(np.asarray(ge[1]), 0)


def test_canary_mask_and_debug_warning(monkeypatch, capfd):
    """The numerical canary is observable (reference `core.cu:353-354`):
    with WARP_RNNT_DEBUG=1 a tripped consistency check prints a warning
    naming the flagged samples, and `mismatch_mask` reports them."""
    from warp_rnnt_tpu.functional.postprocess import mismatch_mask

    monkeypatch.setenv("WARP_RNNT_DEBUG", "1")

    N, T, U = 2, 3, 2
    blank = jnp.full((N, T, U), -1.0, jnp.float32)
    emit = jnp.full((N, T, U), -1.5, jnp.float32)
    alphas = jnp.full((N, T, U), -2.0, jnp.float32)
    betas = jnp.full((N, T, U), -2.0, jnp.float32)
    xn = jnp.array([3, 3], jnp.int32)
    yn = jnp.array([1, 1], jnp.int32)
    betas = betas.at[:, 0, 0].set(-3.0)
    alphas = alphas.at[1, 2, 1].set(-10.0)  # sample 1: ll_f = -11 vs ll_b = -3

    bad = mismatch_mask(blank, alphas, betas, xn, yn)
    np.testing.assert_array_equal(np.asarray(bad), [False, True])

    # the warning prints from inside jit too (jax.debug.print)
    costs, gb, ge = jax.jit(costs_and_grads)(
        blank, emit, alphas, betas, xn, yn, 0.0
    )
    jax.block_until_ready(costs)
    jax.effects_barrier()
    out = capfd.readouterr().out
    assert "WARNING" in out and "mismatch" in out
    np.testing.assert_array_equal(np.asarray(gb[1]), 0)

    # healthy batch: no warning
    capfd.readouterr()
    alphas_ok = alphas.at[1, 2, 1].set(-2.0)
    costs, _, _ = jax.jit(costs_and_grads)(
        blank, emit, alphas_ok, betas, xn, yn, 0.0
    )
    jax.block_until_ready(costs)
    jax.effects_barrier()
    assert "WARNING" not in capfd.readouterr().out


def test_with_internals_returns_mismatch_mask():
    """rnnt_loss_with_internals(return_mismatch=True) appends the (N,) canary
    mask; a healthy batch reports all-False."""
    case = golden.FORWARD_BATCH
    out = rnnt_loss_with_internals(
        jnp.asarray(case["xs"], jnp.float32), jnp.asarray(case["ys"]),
        case["xn"], case["yn"], impl="scan", return_mismatch=True,
    )
    assert len(out) == 5
    costs, grads, alphas, betas, bad = out
    assert bad.shape == costs.shape and bad.dtype == jnp.bool_
    np.testing.assert_array_equal(np.asarray(bad), False)
    np.testing.assert_allclose(
        np.asarray(costs), case["expected_costs"], rtol=1e-4, atol=2e-5
    )


def test_bf16_inputs_fp32_lattice():
    """bf16 joint outputs are accepted; lattice math runs fp32 and grads
    come back in the input dtype (BASELINE config 5 recipe)."""
    case = golden.FORWARD_BATCH
    xs32 = jnp.asarray(case["xs"], jnp.float32)
    xs16 = xs32.astype(jnp.bfloat16)
    ys = jnp.asarray(case["ys"])

    costs16 = rnnt_loss(xs16, ys, case["xn"], case["yn"], impl="scan")
    assert costs16.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(costs16), case["expected_costs"], rtol=2e-2
    )
    g = jax.grad(
        lambda x: rnnt_loss(x, ys, case["xn"], case["yn"], reduction="sum", impl="scan")
    )(xs16)
    assert g.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(g, dtype=np.float32), case["expected_grads"], atol=2e-2
    )


def test_safe_logaddexp_neg_inf():
    a = jnp.asarray([NEG_INF, NEG_INF, 0.0, -1.0])
    b = jnp.asarray([NEG_INF, 0.0, NEG_INF, -1.0])
    out = np.asarray(safe_logaddexp(a, b))
    assert out[0] == NEG_INF and not np.isnan(out[0])
    np.testing.assert_allclose(out[1], 0.0)
    np.testing.assert_allclose(out[2], 0.0)
    np.testing.assert_allclose(out[3], -1.0 + np.log(2.0), rtol=1e-6)


def test_neg_inf_padded_inputs_no_nan():
    """Users sometimes pad log-prob tensors with -inf; no NaN may leak."""
    case = golden.FORWARD_BATCH
    xs = np.asarray(case["xs"], np.float32).copy()
    xn = np.asarray(case["xn"])
    yn = np.asarray(case["yn"])
    for n in range(xs.shape[0]):
        xs[n, xn[n]:] = -np.inf
    costs, grads, _, _ = rnnt_loss_with_internals(
        jnp.asarray(xs), jnp.asarray(case["ys"]), xn, yn, impl="scan"
    )
    assert np.all(np.isfinite(np.asarray(costs)))
    assert not np.any(np.isnan(np.asarray(grads)))
    np.testing.assert_allclose(
        np.asarray(costs), case["expected_costs"], rtol=1e-4, atol=2e-5
    )
