"""The NumPy oracle must reproduce every golden vector from the reference
test suite before it can serve as the conformance oracle for the TPU tiers."""

import numpy as np
import pytest

from warp_rnnt_tpu.reference import transduce_batch, transduce_single

import golden


@pytest.mark.parametrize("name", sorted(golden.ALL_PADDED_CASES))
def test_golden_batch(name):
    case = golden.ALL_PADDED_CASES[name]
    costs, alphas, betas, grads = transduce_batch(
        case["xs"], case["ys"], case["xn"], case["yn"]
    )
    np.testing.assert_array_almost_equal(costs, case["expected_costs"], decimal=6)
    np.testing.assert_array_almost_equal(grads, case["expected_grads"], decimal=6)


def test_forward_backward_agree():
    rng = np.random.RandomState(0)
    xs = golden.log_softmax(rng.randn(7, 12, 6))
    labels = rng.randint(1, 6, size=(11,))
    cost, alphas, betas, grads = transduce_single(xs, labels)
    ll_fwd = alphas[-1, -1] + xs[-1, -1, 0]
    np.testing.assert_allclose(ll_fwd, betas[0, 0], rtol=1e-10)
    # total arc occupancy: every alignment path has exactly T blank arcs and
    # U-1 label arcs, so the gradient sums to -(T + U - 1).
    T, U, _ = xs.shape
    np.testing.assert_allclose(grads.sum(), -(T + U - 1), rtol=1e-8)


def test_fastemit_scales_label_grads_only():
    rng = np.random.RandomState(1)
    xs = golden.log_softmax(rng.randn(5, 4, 6))
    labels = rng.randint(1, 6, size=(3,))
    c0, _, _, g0 = transduce_single(xs, labels, fastemit_lambda=0.0)
    c1, _, _, g1 = transduce_single(xs, labels, fastemit_lambda=0.5)
    np.testing.assert_allclose(c0, c1)
    blank_mask = np.zeros_like(g0, dtype=bool)
    blank_mask[:, :, 0] = True
    np.testing.assert_allclose(g1[blank_mask], g0[blank_mask])
    np.testing.assert_allclose(g1[~blank_mask], 1.5 * g0[~blank_mask], rtol=1e-10)
