"""Conformance of the pure-JAX scan backend against golden vectors and the
NumPy oracle, including autodiff wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warp_rnnt_tpu import rnnt_loss, rnnt_loss_with_internals
from warp_rnnt_tpu.reference import transduce_batch

import golden

IMPL = "scan"


@pytest.mark.parametrize("name", sorted(golden.ALL_PADDED_CASES))
def test_golden_costs_grads(name):
    case = golden.ALL_PADDED_CASES[name]
    xs = jnp.asarray(case["xs"], jnp.float32)
    costs, grads, alphas, betas = rnnt_loss_with_internals(
        xs, jnp.asarray(case["ys"]), case["xn"], case["yn"], impl=IMPL
    )
    np.testing.assert_allclose(
        np.asarray(costs), case["expected_costs"], rtol=1e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(grads), case["expected_grads"], rtol=1e-4, atol=2e-5
    )


def test_golden_gather_layout():
    case = golden.FORWARD_SINGLE
    xs = np.asarray(case["xs"])
    N, T, U, V = xs.shape
    ys = case["ys"]
    # pre-gather to (N, T, U, 2) exactly like the reference gather trick
    gathered = np.zeros((N, T, U, 2), np.float32)
    gathered[..., 0] = xs[..., 0]
    for u in range(U):
        idx = ys[0, u] if u < U - 1 else 0
        gathered[:, :, u, 1] = xs[:, :, u, idx]
    costs, grads, _, _ = rnnt_loss_with_internals(
        jnp.asarray(gathered), jnp.asarray(ys), case["xn"], case["yn"],
        blank=-1, impl=IMPL,
    )
    np.testing.assert_allclose(
        np.asarray(costs), case["expected_costs"], rtol=1e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(grads), golden.FORWARD_SINGLE_GATHER_GRADS, rtol=1e-4, atol=2e-5
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("fastemit", [0.0, 0.3])
def test_random_vs_oracle(seed, fastemit):
    rng = np.random.RandomState(seed)
    N, T, U, V = 5, 17, 8, 11
    xs = golden.log_softmax(rng.randn(N, T, U, V))
    ys = rng.randint(1, V, size=(N, U - 1)).astype(np.int32)
    xn = rng.randint(U, T + 1, size=(N,)).astype(np.int32)
    xn[0] = T
    yn = rng.randint(1, U, size=(N,)).astype(np.int32)
    yn[1] = 0
    yn[2] = U - 1

    exp_costs, exp_alphas, exp_betas, exp_grads = transduce_batch(
        xs, ys, xn, yn, fastemit_lambda=fastemit
    )
    costs, grads, alphas, betas = rnnt_loss_with_internals(
        jnp.asarray(xs, jnp.float32), jnp.asarray(ys), xn, yn,
        fastemit_lambda=fastemit, impl=IMPL,
    )
    np.testing.assert_allclose(np.asarray(costs), exp_costs, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(grads), exp_grads, rtol=2e-4, atol=1e-5)
    # alphas/betas compared on valid cells only
    for n in range(N):
        tv, uv = int(xn[n]), int(yn[n]) + 1
        np.testing.assert_allclose(
            np.asarray(alphas)[n, :tv, :uv], exp_alphas[n, :tv, :uv],
            rtol=2e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(betas)[n, :tv, :uv], exp_betas[n, :tv, :uv],
            rtol=2e-5, atol=1e-5,
        )


def test_jax_grad_matches_oracle():
    rng = np.random.RandomState(3)
    N, T, U, V = 3, 9, 5, 7
    xs = golden.log_softmax(rng.randn(N, T, U, V)).astype(np.float32)
    ys = rng.randint(1, V, size=(N, U - 1)).astype(np.int32)
    xn = np.array([9, 7, 8], np.int32)
    yn = np.array([4, 2, 3], np.int32)

    def loss_fn(x):
        return rnnt_loss(x, jnp.asarray(ys), xn, yn, reduction="sum", impl=IMPL)

    g = jax.grad(loss_fn)(jnp.asarray(xs))
    _, _, _, exp_grads = transduce_batch(xs, ys, xn, yn)
    np.testing.assert_allclose(np.asarray(g), exp_grads, rtol=2e-4, atol=1e-5)


def test_upstream_cotangent_scaling():
    rng = np.random.RandomState(4)
    N, T, U, V = 2, 6, 4, 5
    xs = jnp.asarray(golden.log_softmax(rng.randn(N, T, U, V)), jnp.float32)
    ys = jnp.asarray(rng.randint(1, V, size=(N, U - 1)), jnp.int32)
    xn = np.array([6, 5], np.int32)
    yn = np.array([3, 2], np.int32)
    w = jnp.asarray([0.25, -2.0])

    def weighted(x):
        costs = rnnt_loss(x, ys, xn, yn, impl=IMPL)
        return (w * costs).sum()

    def plain(x):
        return rnnt_loss(x, ys, xn, yn, impl=IMPL)

    g = jax.grad(weighted)(xs)
    _, g_each = jax.vmap(
        lambda xi, yi, xni, yni: jax.value_and_grad(
            lambda x: rnnt_loss(
                x[None], yi[None], jnp.asarray([xni]), jnp.asarray([yni]),
                reduction="sum", impl=IMPL,
            )
        )(xi)
    )(xs, ys, jnp.asarray(xn), jnp.asarray(yn))
    expected = w[:, None, None, None] * g_each
    np.testing.assert_allclose(np.asarray(g), np.asarray(expected), rtol=1e-5, atol=1e-6)


def test_reductions_and_average_frames():
    rng = np.random.RandomState(5)
    N, T, U, V = 4, 8, 3, 6
    xs = jnp.asarray(golden.log_softmax(rng.randn(N, T, U, V)), jnp.float32)
    ys = jnp.asarray(rng.randint(1, V, size=(N, U - 1)), jnp.int32)
    xn = np.full((N,), T, np.int32)
    yn = np.full((N,), U - 1, np.int32)
    costs = rnnt_loss(xs, ys, xn, yn, impl=IMPL)
    assert costs.shape == (N,)
    s = rnnt_loss(xs, ys, xn, yn, reduction="sum", impl=IMPL)
    m = rnnt_loss(xs, ys, xn, yn, reduction="mean", impl=IMPL)
    np.testing.assert_allclose(float(s), float(np.asarray(costs).sum()), rtol=1e-6)
    np.testing.assert_allclose(float(m), float(np.asarray(costs).mean()), rtol=1e-6)
    a = rnnt_loss(xs, ys, xn, yn, average_frames=True, impl=IMPL)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(costs) / xn, rtol=1e-6
    )


def test_inference_fast_path_matches_fwd():
    """The primal (beta-only) path must agree with the differentiated path."""
    rng = np.random.RandomState(6)
    N, T, U, V = 3, 10, 4, 8
    xs = jnp.asarray(golden.log_softmax(rng.randn(N, T, U, V)), jnp.float32)
    ys = jnp.asarray(rng.randint(1, V, size=(N, U - 1)), jnp.int32)
    xn = np.array([10, 8, 9], np.int32)
    yn = np.array([3, 1, 2], np.int32)

    inference = jax.jit(lambda x: rnnt_loss(x, ys, xn, yn, impl=IMPL))(xs)
    train_val, _ = jax.value_and_grad(
        lambda x: rnnt_loss(x, ys, xn, yn, reduction="sum", impl=IMPL)
    )(xs)
    np.testing.assert_allclose(
        float(np.asarray(inference).sum()), float(train_val), rtol=1e-5
    )


def test_jit_compiles():
    rng = np.random.RandomState(7)
    N, T, U, V = 2, 12, 5, 9
    xs = jnp.asarray(golden.log_softmax(rng.randn(N, T, U, V)), jnp.float32)
    ys = jnp.asarray(rng.randint(1, V, size=(N, U - 1)), jnp.int32)
    xn = jnp.full((N,), T, jnp.int32)
    yn = jnp.full((N,), U - 1, jnp.int32)
    f = jax.jit(
        lambda x: jax.value_and_grad(
            lambda z: rnnt_loss(z, ys, xn, yn, reduction="mean", impl=IMPL)
        )(x)
    )
    v1, g1 = f(xs)
    v2, g2 = f(xs)
    assert np.isfinite(float(v1))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2))


def test_validation_errors():
    # 3-D inputs are now the flat (N, T, U*V) layout; only <3-D is invalid
    xs2 = jnp.zeros((2, 12))
    with pytest.raises(ValueError, match="4 dimensions"):
        rnnt_loss(xs2, jnp.zeros((2, 3), jnp.int32), np.array([1, 1]), np.array([1, 1]))
    with pytest.raises(ValueError, match="reduction"):
        rnnt_loss(
            jnp.zeros((1, 2, 2, 3)), jnp.zeros((1, 1), jnp.int32),
            np.array([2]), np.array([1]), reduction="bogus",
        )
    with pytest.raises(ValueError, match="last dim 2"):
        rnnt_loss(
            jnp.zeros((1, 2, 2, 3)), jnp.zeros((1, 1), jnp.int32),
            np.array([2]), np.array([1]), blank=-1,
        )
    with pytest.raises(ValueError, match="labels must have shape"):
        rnnt_loss(
            jnp.zeros((1, 2, 2, 3)), jnp.zeros((1, 5), jnp.int32),
            np.array([2]), np.array([1]),
        )
