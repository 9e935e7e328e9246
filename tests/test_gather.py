"""Unit tests for the blank/label gather formulations.

Covers the three forward formulations in `warp_rnnt_tpu.functional.gather`
(small-V compare-mask, large-V take_along_axis, >4 GiB flattened-3D) and the
shared dense compare-select VJP.  The flat3d path is engaged by shrinking the
byte threshold — on CPU nothing real is 4 GiB.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warp_rnnt_tpu.functional import gather
from warp_rnnt_tpu.functional.gather import gather_blank_label


def _make(N=3, T=7, U=5, V=300, blank=0, seed=0):
    rng = np.random.RandomState(seed)
    xs = jnp.asarray(rng.randn(N, T, U, V).astype(np.float32))
    labels_ext = rng.randint(0, V, size=(N, U)).astype(np.int32)
    labels_ext[:, -1] = blank  # terminal rows gather the blank twice
    loc = jnp.broadcast_to(jnp.asarray(labels_ext)[:, None, :], (N, T, U))
    return xs, loc


def _reference(xs, loc, blank):
    xs, loc = np.asarray(xs), np.asarray(loc)
    out = np.stack(
        [xs[..., blank], np.take_along_axis(xs, loc[..., None], axis=-1)[..., 0]],
        axis=-1,
    )
    return out


@pytest.mark.parametrize("V,blank", [(300, 0), (300, 7), (32, 0)])
def test_flat3d_matches_default(monkeypatch, V, blank):
    xs, loc = _make(V=V, blank=blank)
    want = gather_blank_label(xs, loc, blank)
    monkeypatch.setattr(gather, "_FLAT3D_BYTES", 0)
    monkeypatch.setattr(gather, "_MASK_ROW_BYTES", 0)
    assert gather._use_flat3d(xs, loc)
    got = gather_blank_label(xs, loc, blank)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=0)
    np.testing.assert_allclose(
        np.asarray(got), _reference(xs, loc, blank), rtol=0, atol=0
    )


def test_flat3d_grads_match(monkeypatch):
    xs, loc = _make()
    f = lambda x: jnp.sum(gather_blank_label(x, loc, 0) ** 2)
    want = jax.grad(f)(xs)
    monkeypatch.setattr(gather, "_FLAT3D_BYTES", 0)
    monkeypatch.setattr(gather, "_MASK_ROW_BYTES", 0)
    got = jax.grad(f)(xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=0)


def test_taa_branch_matches_reference(monkeypatch):
    """The large-V take_along_axis branch (the production path for the
    V=5000 benchmark rows) — forced by zeroing the mask crossover while
    keeping the flat3d threshold huge."""
    monkeypatch.setattr(gather, "_MASK_ROW_BYTES", 0)
    for V, blank in [(300, 0), (300, 7), (32, 3)]:
        xs, loc = _make(V=V, blank=blank)
        assert not gather._use_mask(V, xs.dtype)
        assert not gather._use_flat3d(xs, loc)
        got = gather_blank_label(xs, loc, blank)
        np.testing.assert_allclose(
            np.asarray(got), _reference(xs, loc, blank), rtol=0, atol=0
        )
        f = lambda x: jnp.sum(gather_blank_label(x, loc, blank) ** 2)
        g = jax.grad(f)(xs)
        assert np.isfinite(np.asarray(g)).all()


def test_from_logits_taa_branch_matches(monkeypatch):
    """Same forcing through the fused from-logits gather."""
    from warp_rnnt_tpu.functional.from_logits import rnnt_loss_from_logits

    rng = np.random.RandomState(4)
    N, T, U, V = 2, 6, 4, 40
    logits = jnp.asarray(rng.randn(N, T, U, V).astype(np.float32))
    ys = jnp.asarray(rng.randint(1, V, (N, U - 1)).astype(np.int32))
    xn = np.full((N,), T, np.int32)
    yn = np.full((N,), U - 1, np.int32)
    f = lambda x: rnnt_loss_from_logits(x, ys, xn, yn, reduction="mean")
    want, gwant = jax.value_and_grad(f)(logits)
    monkeypatch.setattr(gather, "_MASK_ROW_BYTES", 0)
    got, ggot = jax.value_and_grad(f)(logits)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ggot), np.asarray(gwant), rtol=1e-5, atol=1e-7
    )


def test_flat3d_not_engaged_for_small_or_non4d():
    xs, loc = _make()
    assert not gather._use_flat3d(xs, loc)  # tiny operand
    xs2 = jnp.zeros((10, 500), jnp.float32)  # compact-style (R, V)
    loc2 = jnp.zeros((10,), jnp.int32)
    assert not gather._use_flat3d(xs2, loc2)


@pytest.mark.parametrize("blank", [0, 7])
def test_flat_layout_gather_matches_4d(blank):
    """gather_blank_label_flat on (N, T, U*V) == gather_blank_label on the
    4D view, values and grads (grads come back in flat layout)."""
    xs, loc = _make(V=64, blank=blank)
    N, T, U, V = xs.shape
    xs3 = xs.reshape(N, T, U * V)
    want = gather_blank_label(xs, loc, blank)
    got = gather.gather_blank_label_flat(xs3, loc, blank, V)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=0)

    g4 = jax.grad(lambda x: jnp.sum(gather_blank_label(x, loc, blank) ** 2))(xs)
    g3 = jax.grad(
        lambda x: jnp.sum(gather.gather_blank_label_flat(x, loc, blank, V) ** 2)
    )(xs3)
    np.testing.assert_allclose(
        np.asarray(g3).reshape(N, T, U, V), np.asarray(g4), rtol=1e-6, atol=0
    )


def test_rnnt_loss_flat_layout_matches_4d():
    """Public API: rnnt_loss on 3D (N, T, U*V) log_probs == the 4D call;
    gradients come back flat and reshape to the 4D gradients.  Also the
    fused from-logits entry."""
    from warp_rnnt_tpu import rnnt_loss
    from warp_rnnt_tpu.functional.from_logits import rnnt_loss_from_logits

    rng = np.random.RandomState(9)
    N, T, U, V = 3, 8, 5, 33
    xs4 = jnp.asarray(
        jax.nn.log_softmax(jnp.asarray(rng.randn(N, T, U, V), jnp.float32))
    )
    ys = jnp.asarray(rng.randint(1, V, (N, U - 1)).astype(np.int32))
    xn = np.array([8, 6, 7], np.int32)
    yn = np.array([4, 2, 3], np.int32)
    xs3 = xs4.reshape(N, T, U * V)

    want = rnnt_loss(xs4, ys, xn, yn, impl="scan")
    got = jax.jit(
        lambda x: rnnt_loss(x, ys, xn, yn, impl="scan")
    )(xs3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)

    g4 = jax.grad(
        lambda x: rnnt_loss(x, ys, xn, yn, reduction="sum", impl="scan")
    )(xs4)
    g3 = jax.grad(
        lambda x: rnnt_loss(x, ys, xn, yn, reduction="sum", impl="scan")
    )(xs3)
    np.testing.assert_allclose(
        np.asarray(g3).reshape(N, T, U, V), np.asarray(g4), rtol=1e-6, atol=1e-7
    )

    want_fl, gwant_fl = jax.value_and_grad(
        lambda x: rnnt_loss_from_logits(x, ys, xn, yn, reduction="mean",
                                        impl="scan")
    )(xs4)
    got_fl, ggot_fl = jax.value_and_grad(
        lambda x: rnnt_loss_from_logits(x, ys, xn, yn, reduction="mean",
                                        impl="scan")
    )(xs3)
    np.testing.assert_allclose(float(got_fl), float(want_fl), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ggot_fl).reshape(N, T, U, V), np.asarray(gwant_fl),
        rtol=1e-5, atol=1e-7,
    )


def test_flat_layout_bad_divisor_raises():
    from warp_rnnt_tpu import rnnt_loss

    xs3 = jnp.zeros((2, 4, 33), jnp.float32)  # 33 not divisible by U=4
    ys = jnp.zeros((2, 3), jnp.int32)
    with pytest.raises(ValueError, match="not divisible"):
        rnnt_loss(xs3, ys, np.array([4, 4]), np.array([3, 3]))


def test_terminal_blank_rows_accumulate_grads():
    # loc == blank rows must receive ct[...,0] + ct[...,1] at the blank col
    xs, loc = _make(V=12, blank=3)
    loc = jnp.full_like(loc, 3)
    out, vjp = jax.vjp(lambda x: gather_blank_label(x, loc, 3), xs)
    ct = jnp.ones_like(out)
    (dxs,) = vjp(ct)
    np.testing.assert_allclose(np.asarray(dxs[..., 3]), 2.0)
    mask = np.ones(dxs.shape[-1], bool)
    mask[3] = False
    np.testing.assert_allclose(np.asarray(dxs[..., mask]), 0.0)
