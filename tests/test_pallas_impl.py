"""Pallas kernel conformance (interpret mode on CPU; the same kernels compile
natively on TPU — exercised by bench.py and __graft_entry__.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from warp_rnnt_tpu import rnnt_loss_with_internals
from warp_rnnt_tpu.functional import scan_impl
from warp_rnnt_tpu.ops import pallas_impl
from warp_rnnt_tpu.reference import transduce_batch

import golden


IMPLS = ["pallas"]


@pytest.mark.parametrize("impl", IMPLS)
@pytest.mark.parametrize("name", sorted(golden.ALL_PADDED_CASES))
def test_golden(name, impl):
    case = golden.ALL_PADDED_CASES[name]
    xs = jnp.asarray(case["xs"], jnp.float32)
    costs, grads, _, _ = rnnt_loss_with_internals(
        xs, jnp.asarray(case["ys"]), case["xn"], case["yn"], impl=impl
    )
    np.testing.assert_allclose(
        np.asarray(costs), case["expected_costs"], rtol=1e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(grads), case["expected_grads"], rtol=1e-4, atol=2e-5
    )


@pytest.mark.parametrize("impl", IMPLS)
@pytest.mark.parametrize("seed", [0, 1])
def test_random_vs_oracle(seed, impl):
    rng = np.random.RandomState(seed)
    N, T, U, V = 4, 19, 7, 13
    xs = golden.log_softmax(rng.randn(N, T, U, V))
    ys = rng.randint(1, V, size=(N, U - 1)).astype(np.int32)
    xn = rng.randint(U, T + 1, size=(N,)).astype(np.int32)
    xn[0] = T
    yn = rng.randint(0, U, size=(N,)).astype(np.int32)
    yn[1] = U - 1

    exp_costs, exp_alphas, exp_betas, exp_grads = transduce_batch(xs, ys, xn, yn)
    costs, grads, alphas, betas = rnnt_loss_with_internals(
        jnp.asarray(xs, jnp.float32), jnp.asarray(ys), xn, yn, impl=impl
    )
    np.testing.assert_allclose(np.asarray(costs), exp_costs, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(grads), exp_grads, rtol=2e-4, atol=1e-5)
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


@pytest.mark.parametrize("impl_mod", ["pallas_impl"])
def test_costs_only_matches_forward_backward(impl_mod):
    rng = np.random.RandomState(2)
    N, T, U, V = 3, 11, 5, 6
    xs = golden.log_softmax(rng.randn(N, T, U, V)).astype(np.float32)
    blank_lp = jnp.asarray(xs[..., 0])
    ys = rng.randint(1, V, size=(N, U - 1)).astype(np.int32)
    emit = np.zeros((N, T, U), np.float32)
    for n in range(N):
        for u in range(U - 1):
            emit[n, :, u] = xs[n, :, u, ys[n, u]]
    emit[:, :, U - 1] = xs[:, :, U - 1, 0]
    xn = np.array([11, 9, 10], np.int32)
    yn = np.array([4, 2, 3], np.int32)

    import importlib

    mod = importlib.import_module(f"warp_rnnt_tpu.ops.{impl_mod}")
    c_fast = mod.costs_only(blank_lp, jnp.asarray(emit), xn, yn)
    c_full, _, _, _, _ = mod.forward_backward(
        blank_lp, jnp.asarray(emit), xn, yn
    )
    c_scan = scan_impl.costs_only(blank_lp, jnp.asarray(emit), xn, yn)
    np.testing.assert_allclose(np.asarray(c_fast), np.asarray(c_full), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(c_fast), np.asarray(c_scan), rtol=1e-5)
