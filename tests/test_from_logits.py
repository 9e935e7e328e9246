"""Fused logits path: must equal log_softmax + rnnt_loss in value AND
gradient (through the softmax), without materializing log-probs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warp_rnnt_tpu import rnnt_loss, rnnt_loss_from_logits

import golden


def _case(seed=0, N=4, T=11, U=5, V=9):
    rng = np.random.RandomState(seed)
    logits = rng.randn(N, T, U, V).astype(np.float32)
    ys = rng.randint(1, V, size=(N, U - 1)).astype(np.int32)
    xn = rng.randint(U, T + 1, size=(N,)).astype(np.int32)
    yn = rng.randint(1, U, size=(N,)).astype(np.int32)
    return jnp.asarray(logits), jnp.asarray(ys), xn, yn


@pytest.mark.parametrize("fastemit", [0.0, 0.4])
def test_value_and_grad_match_composed(fastemit):
    logits, ys, xn, yn = _case()

    def composed(x):
        return rnnt_loss(
            jax.nn.log_softmax(x, -1), ys, xn, yn,
            reduction="sum", fastemit_lambda=fastemit, impl="scan",
        )

    def fused(x):
        return rnnt_loss_from_logits(
            x, ys, xn, yn, reduction="sum", fastemit_lambda=fastemit, impl="scan"
        )

    v0, g0 = jax.value_and_grad(composed)(logits)
    v1, g1 = jax.value_and_grad(fused)(logits)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=5e-4, atol=1e-5)


def test_large_vocab_path():
    logits, ys, xn, yn = _case(seed=1, N=2, T=7, U=3, V=300)  # exercises the taa branch pre-threshold-change; now mask
    v0, g0 = jax.value_and_grad(
        lambda x: rnnt_loss(
            jax.nn.log_softmax(x, -1), ys, xn, yn, reduction="mean", impl="scan"
        )
    )(logits)
    v1, g1 = jax.value_and_grad(
        lambda x: rnnt_loss_from_logits(x, ys, xn, yn, reduction="mean", impl="scan")
    )(logits)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=5e-4, atol=1e-6)


def test_golden_from_logits():
    # golden case xs are log_softmax(raw); feed the raw logits instead
    raw = np.asarray(golden._FWD_BATCH_XS, dtype=np.float32)
    case = golden.FORWARD_BATCH
    costs = rnnt_loss_from_logits(
        jnp.asarray(raw), jnp.asarray(case["ys"]), case["xn"], case["yn"],
        impl="scan",
    )
    np.testing.assert_allclose(
        np.asarray(costs), case["expected_costs"], rtol=1e-4, atol=2e-5
    )


def test_inference_primal_matches():
    logits, ys, xn, yn = _case(seed=2)
    inf = jax.jit(
        lambda x: rnnt_loss_from_logits(x, ys, xn, yn, impl="scan")
    )(logits)
    train, _ = jax.value_and_grad(
        lambda x: rnnt_loss_from_logits(x, ys, xn, yn, reduction="sum", impl="scan")
    )(logits)
    np.testing.assert_allclose(float(np.asarray(inf).sum()), float(train), rtol=1e-5)


def test_flat3d_formulation_matches(monkeypatch):
    """The >4 GiB flat-3D gather route inside _gather2 (forced via the
    threshold) is value- and grad-identical to the default route."""
    from warp_rnnt_tpu.functional import gather

    logits, ys, xn, yn = _case(seed=3)
    f = lambda x: rnnt_loss_from_logits(x, ys, xn, yn, reduction="mean")
    want, gwant = jax.value_and_grad(f)(logits)
    monkeypatch.setattr(gather, "_FLAT3D_BYTES", 0)
    monkeypatch.setattr(gather, "_MASK_ROW_BYTES", 0)
    got, ggot = jax.value_and_grad(f)(logits)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ggot), np.asarray(gwant), rtol=1e-5, atol=1e-7
    )
