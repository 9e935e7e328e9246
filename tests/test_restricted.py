"""Alignment-restricted loss: band semantics vs the unrestricted loss,
the Viterbi path, and gradient support."""

import numpy as np
import jax
import jax.numpy as jnp

from warp_rnnt_tpu import rnnt_alignment, rnnt_loss
from warp_rnnt_tpu.functional.restricted import rnnt_loss_restricted

import golden


def _batch(seed=0, N=4, T=10, U=5, V=7):
    rng = np.random.RandomState(seed)
    xs = golden.log_softmax(rng.randn(N, T, U, V)).astype(np.float32)
    ys = rng.randint(1, V, size=(N, U - 1)).astype(np.int32)
    xn = np.array([10, 8, 10, 7], np.int32)
    yn = np.array([4, 2, 3, 4], np.int32)
    return (jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(xn),
            jnp.asarray(yn))


def test_huge_band_equals_unrestricted():
    xs, ys, xn, yn = _batch()
    _, frames = rnnt_alignment(xs, ys, xn, yn)
    unres = rnnt_loss(xs, ys, xn, yn, reduction="none")
    res = rnnt_loss_restricted(xs, ys, xn, yn, frames,
                               left_context=1000, right_context=1000,
                               reduction="none")
    np.testing.assert_allclose(np.asarray(res), np.asarray(unres), rtol=1e-5)


def test_zero_band_recovers_viterbi_path():
    """With l = r = 0 around the Viterbi alignment exactly one path remains,
    so the restricted log-likelihood equals the Viterbi path score."""
    xs, ys, xn, yn = _batch(seed=3)
    scores, frames = rnnt_alignment(xs, ys, xn, yn)
    res = rnnt_loss_restricted(xs, ys, xn, yn, frames,
                               left_context=0, right_context=0,
                               reduction="none")
    np.testing.assert_allclose(np.asarray(res), -np.asarray(scores),
                               rtol=1e-5)


def test_restriction_monotone_and_grad_support():
    xs, ys, xn, yn = _batch(seed=5)
    _, frames = rnnt_alignment(xs, ys, xn, yn)
    unres = np.asarray(rnnt_loss(xs, ys, xn, yn, reduction="none"))
    prev = None
    for l, r in ((0, 0), (2, 1), (1000, 1000)):
        cost = np.asarray(
            rnnt_loss_restricted(xs, ys, xn, yn, frames, l, r,
                                 reduction="none")
        )
        assert np.all(cost >= unres - 1e-5)  # fewer paths -> higher cost
        if prev is not None:
            assert np.all(cost <= prev + 1e-5)  # wider band -> lower cost
        prev = cost

    # gradient support: emit-label entries outside the band get exactly 0
    l, r = 2, 1
    grad = jax.grad(
        lambda z: rnnt_loss_restricted(z, ys, xn, yn, frames, l, r,
                                       reduction="sum")
    )(xs)
    grad = np.asarray(grad)
    N, T, U, V = grad.shape
    frames_np = np.asarray(frames)
    for n in range(N):
        for u in range(int(yn[n])):
            lab = int(ys[n, u])
            for t in range(int(xn[n])):
                if not (frames_np[n, u] - l <= t <= frames_np[n, u] + r):
                    assert grad[n, t, u, lab] == 0.0, (n, t, u)


def test_infeasible_band_returns_inf_and_zero_grads():
    """Contract: if the band prunes every path the sample's cost is +inf and
    its gradients are exactly zero; feasible samples in the same batch are
    unaffected (see the contract note in functional/restricted.py)."""
    xs, ys, xn, yn = _batch(seed=11)
    _, frames = rnnt_alignment(xs, ys, xn, yn)
    # sample 0: force labels out of order (label 1 at frame 8, label 2 at
    # frame 0, zero context) -> no monotone path can satisfy both bands
    frames_bad = np.asarray(frames).copy()
    frames_bad[0, 0] = 8
    frames_bad[0, 1:] = 0
    frames_bad = jnp.asarray(frames_bad)

    costs = np.asarray(
        rnnt_loss_restricted(xs, ys, xn, yn, frames_bad, 0, 0,
                             reduction="none")
    )
    assert np.isposinf(costs[0])
    assert np.all(np.isfinite(costs[1:]))

    # the infeasible sample's upstream cotangent is killed by the +inf
    # where-branch, so its grads are exactly zero and nothing NaNs
    grads = np.asarray(
        jax.grad(
            lambda z: jnp.sum(
                rnnt_loss_restricted(z, ys, xn, yn, frames_bad, 0, 0,
                                     reduction="none")
            )
        )(xs)
    )
    assert np.all(grads[0] == 0.0)
    assert np.any(grads[1] != 0.0)
    assert np.all(np.isfinite(grads))


def test_infeasible_sample_excluded_from_batch_reductions():
    """reduction='sum'|'mean' skip infeasible samples (mean divides by the
    feasible count), so one bad alignment cannot poison the batch loss with
    +inf; feasible samples keep real gradients and the infeasible one stays
    exactly zero.  See the contract note in functional/restricted.py."""
    xs, ys, xn, yn = _batch(seed=11)
    _, frames = rnnt_alignment(xs, ys, xn, yn)
    frames_bad = np.asarray(frames).copy()
    frames_bad[0, 0] = 8
    frames_bad[0, 1:] = 0
    frames_bad = jnp.asarray(frames_bad)

    per_sample = np.asarray(
        rnnt_loss_restricted(xs, ys, xn, yn, frames_bad, 0, 0,
                             reduction="none")
    )
    assert np.isposinf(per_sample[0])
    feasible = per_sample[1:]

    s = float(rnnt_loss_restricted(xs, ys, xn, yn, frames_bad, 0, 0,
                                   reduction="sum"))
    m = float(rnnt_loss_restricted(xs, ys, xn, yn, frames_bad, 0, 0,
                                   reduction="mean"))
    np.testing.assert_allclose(s, feasible.sum(), rtol=1e-6)
    np.testing.assert_allclose(m, feasible.mean(), rtol=1e-6)

    grads = np.asarray(
        jax.grad(
            lambda z: rnnt_loss_restricted(z, ys, xn, yn, frames_bad, 0, 0,
                                           reduction="mean")
        )(xs)
    )
    assert np.all(grads[0] == 0.0)
    assert np.any(grads[1] != 0.0)
    assert np.all(np.isfinite(grads))

    # all-infeasible batch: loss 0, grads 0, nothing NaNs
    frames_all_bad = np.asarray(frames).copy()
    frames_all_bad[:, 0] = 8
    frames_all_bad[:, 1:] = 0
    frames_all_bad = jnp.asarray(frames_all_bad)
    m0 = float(rnnt_loss_restricted(xs, ys, xn, yn, frames_all_bad, 0, 0,
                                    reduction="mean"))
    assert m0 == 0.0
    g0 = np.asarray(
        jax.grad(
            lambda z: rnnt_loss_restricted(z, ys, xn, yn, frames_all_bad, 0, 0,
                                           reduction="mean")
        )(xs)
    )
    assert np.all(g0 == 0.0)


def test_restricted_jits_and_takes_gathered_input():
    xs, ys, xn, yn = _batch(seed=7)
    _, frames = rnnt_alignment(xs, ys, xn, yn)
    f = jax.jit(
        lambda z: rnnt_loss_restricted(z, ys, xn, yn, frames, 3, 2,
                                       reduction="mean")
    )
    assert np.isfinite(float(f(xs)))

    from warp_rnnt_tpu.functional.loss import _gather_blank_emit

    g = _gather_blank_emit(xs, ys, 0)
    res2 = rnnt_loss_restricted(g, ys, xn, yn, frames, 3, 2,
                                reduction="none", blank=-1)
    res1 = rnnt_loss_restricted(xs, ys, xn, yn, frames, 3, 2,
                                reduction="none")
    np.testing.assert_allclose(np.asarray(res2), np.asarray(res1), rtol=1e-6)
