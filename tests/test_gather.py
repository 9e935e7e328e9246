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


# ---------------------------------------------------------------------------
# Pallas flat-layout grad writer (ops/flat_kernels.py) — the >4 GiB VJP


def _flat_reference(ct, loc_rows, blank, V, N, T, U):
    """NumPy oracle: dense compare-select in 4D, flattened."""
    ct = np.asarray(ct, np.float32)
    loc = np.broadcast_to(np.asarray(loc_rows)[:, None, :], (N, T, U))
    v_iota = np.arange(V).reshape(1, 1, 1, V)
    d4 = ct[..., 0:1] * (v_iota == blank) + ct[..., 1:2] * (
        v_iota == loc[..., None]
    )
    return d4.reshape(N, T, U * V)


@pytest.mark.parametrize("V,blank", [(160, 0), (160, 7), (3000, 2999), (128, 0)])
def test_flat_grad_write_kernel_matches_oracle(V, blank):
    """Interpret-mode kernel vs the NumPy oracle: BJ=128-class blocks
    straddle u boundaries (V=160), tail blocks are masked (UV % BJ != 0),
    T is not a sublane multiple."""
    from warp_rnnt_tpu.ops import flat_kernels

    rng = np.random.RandomState(5)
    N, T, U = 2, 11, 3
    ct0 = jnp.asarray(rng.randn(N, T, U).astype(np.float32))
    ct1 = jnp.asarray(rng.randn(N, T, U).astype(np.float32))
    loc_rows = rng.randint(0, V, size=(N, U)).astype(np.int32)
    loc_rows[:, -1] = blank  # terminal rows accumulate both channels
    got = flat_kernels.flat_grad_write(
        ct0, ct1, jnp.asarray(loc_rows), blank, V, U * V, interpret=True
    )
    ct = np.stack([np.asarray(ct0), np.asarray(ct1)], axis=-1)
    want = _flat_reference(ct, loc_rows, blank, V, N, T, U)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-7)


def test_flat_grad_write_bf16_output():
    from warp_rnnt_tpu.ops import flat_kernels

    rng = np.random.RandomState(6)
    N, T, U, V = 2, 5, 3, 256
    ct0 = jnp.asarray(rng.randn(N, T, U).astype(np.float32))
    ct1 = jnp.asarray(rng.randn(N, T, U).astype(np.float32))
    loc_rows = jnp.asarray(rng.randint(0, V, size=(N, U)).astype(np.int32))
    got = flat_kernels.flat_grad_write(
        ct0, ct1, loc_rows, 0, V, U * V, out_dtype=jnp.bfloat16,
        interpret=True,
    )
    assert got.dtype == jnp.bfloat16
    ct = np.stack([np.asarray(ct0), np.asarray(ct1)], axis=-1)
    want = _flat_reference(ct, np.asarray(loc_rows), 0, V, N, T, U)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), want, rtol=8e-3, atol=1e-3
    )


def test_flat_vjp_routes_through_kernel(monkeypatch):
    """gather_blank_label_flat's grad with the kernel forced equals the XLA
    fallback path, through jit."""
    xs, loc = _make(V=200, blank=0)
    N, T, U, V = 3, 7, 5, 200
    xs3 = xs.reshape(N, T, U * V)

    def g(x):
        return jax.grad(
            lambda z: jnp.sum(
                gather.gather_blank_label_flat(z, loc, 0, V) ** 2
            )
        )(x)

    monkeypatch.setattr(gather, "_FORCE_FLAT_KERNEL", False)
    want = g(xs3)
    monkeypatch.setattr(gather, "_FORCE_FLAT_KERNEL", True)
    got = jax.jit(g)(xs3)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7
    )


def test_flat_write_supported_gate():
    from warp_rnnt_tpu.ops import flat_kernels

    assert not flat_kernels.flat_write_supported(100)  # < 128 lanes
    assert flat_kernels.flat_write_supported(128)
    assert flat_kernels.flat_write_supported(5000)


def test_flat_grad_write_alias_never_read():
    """out_alias is an alias TARGET only: filling it with garbage must not
    change the result (the kernel fully overwrites every output block)."""
    from warp_rnnt_tpu.ops import flat_kernels

    rng = np.random.RandomState(7)
    N, T, U, V = 2, 11, 3, 160
    ct0 = jnp.asarray(rng.randn(N, T, U).astype(np.float32))
    ct1 = jnp.asarray(rng.randn(N, T, U).astype(np.float32))
    loc_rows = jnp.asarray(rng.randint(0, V, size=(N, U)).astype(np.int32))
    garbage = jnp.asarray(
        rng.randn(N, T, U * V).astype(np.float32) * 1e6 + np.nan
    )
    got = flat_kernels.flat_grad_write(
        ct0, ct1, loc_rows, 7, V, U * V, interpret=True, out_alias=garbage
    )
    ct = np.stack([np.asarray(ct0), np.asarray(ct1)], axis=-1)
    want = _flat_reference(ct, np.asarray(loc_rows), 7, V, N, T, U)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-7)


def test_flat_arg_formats_pins_row_major():
    """The public layout-pinning helper (README "flat layout" one-liner):
    returns row-major Formats, jits cleanly as in_/out_shardings, and the
    compiled program contains no full-tensor transpose/relayout of the flat
    operand (the 47-72 ms trap `scripts/exp_flat_alias.py` diagnosed)."""
    import re

    from jax.experimental.layout import Layout

    from warp_rnnt_tpu import flat_arg_formats, rnnt_loss

    arg_fmt, grad_fmt = flat_arg_formats()
    assert arg_fmt.layout == Layout((0, 1, 2))
    assert grad_fmt.layout == Layout((0, 1, 2))

    rng = np.random.RandomState(3)
    N, T, U, V = 2, 6, 4, 40
    xs3 = jnp.asarray(rng.randn(N, T, U * V).astype(np.float32))
    ys = jnp.asarray(rng.randint(1, V, size=(N, U - 1)).astype(np.int32))
    xn = jnp.full((N,), T, jnp.int32)
    yn = jnp.full((N,), U - 1, jnp.int32)

    def loss_vg(x):
        return jax.value_and_grad(
            lambda z: rnnt_loss(z, ys, xn, yn, reduction="mean", gather=True)
        )(x)

    step = jax.jit(loss_vg, in_shardings=arg_fmt,
                   out_shardings=(None, grad_fmt))
    compiled = step.lower(xs3).compile()
    cost, grad = step(xs3)
    cost4, grad4 = jax.jit(loss_vg)(xs3)
    np.testing.assert_allclose(np.asarray(cost), np.asarray(cost4), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad4), rtol=1e-6)

    big = rf"f32\[{N},{T},{U * V}\]"
    for line in compiled.as_text().splitlines():
        ls = line.strip()
        op = ls.split(" = ")[0]
        if re.search(big, ls.split(" = ")[-1][:40]) and (
            "transpose" in op or "copy" in op
        ):
            raise AssertionError(f"full-tensor relayout in pinned HLO: {ls}")
