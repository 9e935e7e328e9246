"""Compact (packed) layout conformance: golden vectors, autodiff scatter,
and parity with the padded path."""

import jax
import jax.numpy as jnp
import numpy as np

from warp_rnnt_tpu import rnnt_loss
from warp_rnnt_tpu.functional.compact import (
    compact_gather,
    rnnt_loss_compact_with_internals,
)

import golden

EXPECTED_COMPACT_GRADS = np.array(
    [
        [-0.308198071906, -0.6918019280939998, 0.0, 0.0, 0.0],
        [-0.308198071906, 0.0, -0.3836038561880001, 0.0, 0.0],
        [-0.3836038561880001, 0.0, 0.0, 0.0, 0.0],
        [0.0, -0.308198071906, 0.0, 0.0, 0.0],
        [0.0, 0.0, -0.6163961438119995, 0.0, 0.0],
        [-0.9999999999999991, 0.0, 0.0, 0.0, 0.0],
        [-0.45920877, -0.54079123, -0.0, -0.0, -0.0],
        [-0.32392462, -0.0, -0.21686661, -0.0, -0.0],
        [-0.21686661, -0.0, -0.0, -0.0, -0.0],
        [-0.13528414, -0.32392462, -0.0, -0.0, -0.0],
        [-0.29937584, -0.0, -0.3484734, -0.0, -0.0],
        [-0.56534001, -0.0, -0.0, -0.0, -0.0],
        [-0.0, -0.13528414, -0.0, -0.0, -0.0],
        [-0.0, -0.0, -0.43465999, -0.0, -0.0],
        [-1.0, -0.0, -0.0, -0.0, -0.0],
    ]
)


def _pack(case):
    xs = np.asarray(case["xs"], np.float32)
    ys = np.asarray(case["ys"])
    xn = np.asarray(case["xn"])
    yn = np.asarray(case["yn"])
    packed = np.concatenate(
        [
            xs[i, : xn[i], : yn[i] + 1].reshape(-1, xs.shape[-1])
            for i in range(xs.shape[0])
        ],
        axis=0,
    )
    packed_ys = np.concatenate([ys[i, : yn[i]] for i in range(ys.shape[0])])
    return packed, packed_ys.astype(np.int32), xn, yn


def test_golden_compact_batch():
    packed, packed_ys, xn, yn = _pack(golden.FORWARD_BATCH)
    costs, grads, loc = rnnt_loss_compact_with_internals(
        jnp.asarray(packed), jnp.asarray(packed_ys), xn, yn, impl="scan"
    )
    np.testing.assert_allclose(
        np.asarray(costs), golden.FORWARD_BATCH["expected_costs"],
        rtol=1e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(grads), EXPECTED_COMPACT_GRADS, rtol=1e-4, atol=2e-5
    )


def test_compact_loc_semantics():
    packed, packed_ys, xn, yn = _pack(golden.FORWARD_BATCH)
    _, loc = compact_gather(jnp.asarray(packed), jnp.asarray(packed_ys), xn, yn)
    # sample 0: T=2, U=3, labels [1, 2]; rows are (t, u) row-major.
    expected_loc_s0 = [1, 2, 0, 1, 2, 0]
    # sample 1: T=3, U=3, labels [1, 2]
    expected_loc_s1 = [1, 2, 0, 1, 2, 0, 1, 2, 0]
    np.testing.assert_array_equal(np.asarray(loc), expected_loc_s0 + expected_loc_s1)


def test_compact_via_public_api_and_grad():
    packed, packed_ys, xn, yn = _pack(golden.FORWARD_BATCH)
    xs = jnp.asarray(packed)

    costs = rnnt_loss(
        xs, jnp.asarray(packed_ys), xn, yn, compact=True, impl="scan"
    )
    np.testing.assert_allclose(
        np.asarray(costs), golden.FORWARD_BATCH["expected_costs"],
        rtol=1e-4, atol=2e-5,
    )

    g = jax.grad(
        lambda x: rnnt_loss(
            x, jnp.asarray(packed_ys), xn, yn,
            compact=True, reduction="sum", impl="scan",
        )
    )(xs)
    np.testing.assert_allclose(
        np.asarray(g), EXPECTED_COMPACT_GRADS, rtol=1e-4, atol=2e-5
    )


def test_compact_matches_padded_random():
    rng = np.random.RandomState(11)
    N, T, U, V = 4, 12, 6, 9
    xs = golden.log_softmax(rng.randn(N, T, U, V)).astype(np.float32)
    ys = rng.randint(1, V, size=(N, U - 1)).astype(np.int32)
    xn = np.array([12, 9, 10, 7], np.int32)
    yn = np.array([5, 3, 0, 4], np.int32)
    case = dict(xs=xs, ys=ys, xn=xn, yn=yn)
    packed, packed_ys, _, _ = _pack(case)

    padded_costs = rnnt_loss(jnp.asarray(xs), jnp.asarray(ys), xn, yn, impl="scan")
    compact_costs = rnnt_loss(
        jnp.asarray(packed), jnp.asarray(packed_ys), xn, yn,
        compact=True, impl="scan",
    )
    np.testing.assert_allclose(
        np.asarray(compact_costs), np.asarray(padded_costs), rtol=1e-5, atol=1e-6
    )

    g_pad = jax.grad(
        lambda x: rnnt_loss(x, jnp.asarray(ys), xn, yn, reduction="sum", impl="scan")
    )(jnp.asarray(xs))
    g_cmp = jax.grad(
        lambda x: rnnt_loss(
            x, jnp.asarray(packed_ys), xn, yn,
            compact=True, reduction="sum", impl="scan",
        )
    )(jnp.asarray(packed))
    # repack padded grads and compare
    g_pad = np.asarray(g_pad)
    repacked = np.concatenate(
        [g_pad[i, : xn[i], : yn[i] + 1].reshape(-1, V) for i in range(N)], axis=0
    )
    np.testing.assert_allclose(np.asarray(g_cmp), repacked, rtol=1e-4, atol=1e-6)


def test_compact_padded_packed_buffer_pad_rows_get_zero_grads():
    """A bucketed packed buffer (STU > sum(xn*(yn+1)), the natural shape
    under jit where STU must be static) must behave exactly like the
    exact-size buffer: same costs, same grads on real rows, EXACT zeros on
    pad rows.  Regression test for the clamped-gather aliasing in the
    hand-written compact_to_padded VJP (pad rows used to receive the last
    sample's duplicated cell grads)."""
    packed, packed_ys, xn, yn = _pack(golden.FORWARD_BATCH)
    n_pad = 4
    padded_buf = np.concatenate(
        [packed, np.full((n_pad, packed.shape[1]), -1.0, np.float32)], axis=0
    )

    def loss(x):
        return rnnt_loss(
            x, jnp.asarray(packed_ys), xn, yn,
            compact=True, reduction="sum", impl="scan",
            max_frames=int(xn.max()), max_labels=int(yn.max()),
        )

    costs = rnnt_loss(
        jnp.asarray(padded_buf), jnp.asarray(packed_ys), xn, yn,
        compact=True, impl="scan",
        max_frames=int(xn.max()), max_labels=int(yn.max()),
    )
    np.testing.assert_allclose(
        np.asarray(costs), golden.FORWARD_BATCH["expected_costs"],
        rtol=1e-4, atol=2e-5,
    )

    g = np.asarray(jax.grad(loss)(jnp.asarray(padded_buf)))
    np.testing.assert_allclose(
        g[: packed.shape[0]], EXPECTED_COMPACT_GRADS, rtol=1e-4, atol=2e-5
    )
    np.testing.assert_array_equal(g[packed.shape[0]:], 0.0)

    # same contract through the internals (conformance) entry
    _, grads_int, _ = rnnt_loss_compact_with_internals(
        jnp.asarray(padded_buf), jnp.asarray(packed_ys), xn, yn, impl="scan",
        max_frames=int(xn.max()), max_labels=int(yn.max()),
    )
    grads_int = np.asarray(grads_int)
    np.testing.assert_allclose(
        grads_int[: packed.shape[0]], EXPECTED_COMPACT_GRADS,
        rtol=1e-4, atol=2e-5,
    )
    np.testing.assert_array_equal(grads_int[packed.shape[0]:], 0.0)


def test_compact_under_jit_with_static_bounds():
    packed, packed_ys, xn, yn = _pack(golden.FORWARD_BATCH)

    @jax.jit
    def f(x, y, xn_, yn_):
        return rnnt_loss(
            x, y, xn_, yn_, compact=True, impl="scan",
            max_frames=3, max_labels=2,
        )

    costs = f(jnp.asarray(packed), jnp.asarray(packed_ys), jnp.asarray(xn), jnp.asarray(yn))
    np.testing.assert_allclose(
        np.asarray(costs), golden.FORWARD_BATCH["expected_costs"],
        rtol=1e-4, atol=2e-5,
    )


def test_movement_kernel_routing(monkeypatch):
    """The Pallas movement kernel is auto-selected exactly in the small-V
    (compare-mask) regime on TPU; large V keeps the XLA take_along_axis
    composition (measured crossovers in scripts/exp_movement_isolation.py)."""
    import jax as _jax

    from warp_rnnt_tpu.functional import compact as compact_mod

    # V-regime gate applies regardless of backend
    assert not compact_mod._use_movement_kernel(5000)
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    assert compact_mod._use_movement_kernel(28)
    assert compact_mod._use_movement_kernel(3072)      # = 12 KiB fp32 rows
    assert not compact_mod._use_movement_kernel(3073)  # first row past it
    # bf16 rows are half the bytes: crossover doubles
    import jax.numpy as _jnp

    assert compact_mod._use_movement_kernel(6144, _jnp.bfloat16)
    monkeypatch.setattr(_jax, "default_backend", lambda: "cpu")
    assert not compact_mod._use_movement_kernel(28)
    # the force hook (used by tests/benchmarks) overrides everything
    monkeypatch.setattr(compact_mod, "_FORCE_KERNEL", True)
    assert compact_mod._use_movement_kernel(5000)
