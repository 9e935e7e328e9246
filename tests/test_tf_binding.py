"""TF front-end: golden values, inner gather, gradients via GradientTape —
mirrors the reference TF test suite (`tensorflow_binding/warp_rnnt_tf/test.py`)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from warp_rnnt_tpu.bindings.tf_binding import gather_log_probs, rnnt_loss

import golden


def _t(case):
    return (
        tf.constant(np.asarray(case["xs"]), tf.float32),
        tf.constant(case["ys"], tf.int32),
        tf.constant(case["xn"], tf.int32),
        tf.constant(case["yn"], tf.int32),
    )


@pytest.mark.parametrize("name", sorted(golden.ALL_PADDED_CASES))
def test_golden_with_gradient(name):
    case = golden.ALL_PADDED_CASES[name]
    xs, ys, xn, yn = _t(case)
    with tf.GradientTape() as tape:
        tape.watch(xs)
        costs = rnnt_loss(xs, ys, xn, yn)
        total = tf.reduce_sum(costs)
    np.testing.assert_allclose(
        costs.numpy(), case["expected_costs"], rtol=1e-4, atol=2e-5
    )
    grads = tape.gradient(total, xs)
    np.testing.assert_allclose(
        grads.numpy(), case["expected_grads"], rtol=1e-4, atol=2e-5
    )


def test_inner_gather():
    case = golden.FORWARD_SINGLE
    xs, ys, xn, yn = _t(case)
    with tf.GradientTape() as tape:
        tape.watch(xs)
        costs = rnnt_loss(xs, ys, xn, yn, gather=True)
        total = tf.reduce_sum(costs)
    np.testing.assert_allclose(
        costs.numpy(), case["expected_costs"], rtol=1e-4, atol=2e-5
    )
    grads = tape.gradient(total, xs)
    np.testing.assert_allclose(
        grads.numpy(), case["expected_grads"], rtol=1e-4, atol=2e-5
    )


def test_gather_log_probs_matches_reference_layout():
    case = golden.FORWARD_SINGLE
    xs, ys, _, _ = _t(case)
    g = gather_log_probs(xs, ys).numpy()
    xs_np = np.asarray(case["xs"])
    N, T, U, V = xs_np.shape
    expected = np.zeros((N, T, U, 2), np.float32)
    expected[..., 0] = xs_np[..., 0]
    for u in range(U):
        idx = case["ys"][0, u] if u < U - 1 else 0
        expected[:, :, u, 1] = xs_np[:, :, u, idx]
    np.testing.assert_allclose(g, expected, rtol=1e-6)


def test_inside_tf_function():
    case = golden.FORWARD_BATCH
    xs, ys, xn, yn = _t(case)

    @tf.function
    def f(x):
        return rnnt_loss(x, ys, xn, yn, reduction="mean")

    np.testing.assert_allclose(
        float(f(xs).numpy()),
        float(np.mean(case["expected_costs"])),
        rtol=1e-5,
    )


def test_reductions_and_average_frames():
    case = golden.FORWARD_BATCH
    xs, ys, xn, yn = _t(case)
    c = rnnt_loss(xs, ys, xn, yn).numpy()
    s = float(rnnt_loss(xs, ys, xn, yn, reduction="sum").numpy())
    a = rnnt_loss(xs, ys, xn, yn, average_frames=True).numpy()
    np.testing.assert_allclose(s, c.sum(), rtol=1e-6)
    np.testing.assert_allclose(a, c / np.asarray(case["xn"]), rtol=1e-6)
