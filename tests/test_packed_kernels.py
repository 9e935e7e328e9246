"""Pallas packed-movement kernels (interpret mode on CPU): parity with the
XLA composition (`compact_gather` + `compact_to_padded`), gradients, ragged
edge shapes, bucketed pad buffers, and the public compact API with the
kernel path forced."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warp_rnnt_tpu.functional import compact as compact_mod
from warp_rnnt_tpu.functional.compact import compact_gather, compact_to_padded
from warp_rnnt_tpu.ops.packed_kernels import _loc_rows, packed_lattice

import golden


def _case(xn, yn, V=13, seed=0, pad_rows=0):
    rng = np.random.RandomState(seed)
    xn = np.asarray(xn, np.int32)
    yn = np.asarray(yn, np.int32)
    STU = int((xn * (yn + 1)).sum())
    xs = rng.randn(STU + pad_rows, V).astype(np.float32)
    ys = np.concatenate(
        [rng.randint(1, V, y) for y in yn] or [np.zeros(0, np.int64)]
    ).astype(np.int32)
    return (jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(xn),
            jnp.asarray(yn), STU)


RAGGED_CASES = [
    ([9, 5, 7], [4, 2, 3], 13),     # generic ragged
    ([4], [3], 7),                  # single sample
    ([3, 6], [0, 2], 9),            # a zero-label sample (stride 1)
    ([40, 33, 17, 29], [11, 7, 0, 11], 33),   # T spans multiple tiles
    ([2, 2], [5, 5], 5),            # T < U (tall lattices)
]


@pytest.mark.parametrize("xn,yn,V", RAGGED_CASES)
def test_packed_lattice_matches_xla(xn, yn, V):
    xs, ys, xn_j, yn_j, STU = _case(xn, yn, V)
    T, U = int(max(xn)), int(max(yn)) + 1
    g2, _ = compact_gather(xs, ys, xn_j, yn_j, 0)
    want = compact_to_padded(g2, xn_j, yn_j, T, U)
    lr = _loc_rows(ys, xn_j, yn_j, U, 0)
    got = packed_lattice(xs, lr, xn_j, yn_j, 0, T, U)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def loss_ref(x):
        return (compact_to_padded(
            compact_gather(x, ys, xn_j, yn_j, 0)[0], xn_j, yn_j, T, U
        ) ** 2).sum()

    def loss_ker(x):
        return (packed_lattice(x, lr, xn_j, yn_j, 0, T, U) ** 2).sum()

    gr = jax.grad(loss_ref)(xs)
    gk = jax.grad(loss_ker)(xs)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=1e-5)


def test_packed_lattice_nonzero_blank_and_terminal_collision():
    """blank=3: terminal rows gather the blank into BOTH channels, and the
    backward accumulates both cotangents at the blank column."""
    xs, ys, xn_j, yn_j, STU = _case([5, 4], [2, 1], V=9, seed=2)
    ys = jnp.where(ys == 3, 4, ys)  # labels must avoid the blank index
    T, U = 5, 3
    lr = _loc_rows(ys, xn_j, yn_j, U, 3)
    out, vjp = jax.vjp(
        lambda x: packed_lattice(x, lr, xn_j, yn_j, 3, T, U), xs
    )
    g2, _ = compact_gather(xs, ys, xn_j, yn_j, 3)
    want = compact_to_padded(g2, xn_j, yn_j, T, U)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)
    (dxs,) = vjp(jnp.ones_like(out))
    # terminal rows (u == yn): both channels hit the blank column -> 2.0
    dxs = np.asarray(dxs)
    row0_terminal = 0 * (int(yn_j[0]) + 1) + int(yn_j[0])  # first frame, u=yn
    assert dxs[row0_terminal, 3] == 2.0


def test_packed_lattice_bucketed_pad_rows():
    xs, ys, xn_j, yn_j, STU = _case([6, 4], [2, 3], V=11, seed=4, pad_rows=7)
    T, U = 6, 4
    lr = _loc_rows(ys, xn_j, yn_j, U, 0)
    g = jax.grad(
        lambda x: (packed_lattice(x, lr, xn_j, yn_j, 0, T, U) ** 2).sum()
    )(xs)
    g = np.asarray(g)
    np.testing.assert_array_equal(g[STU:], 0.0)
    g_exact = jax.grad(
        lambda x: (packed_lattice(x, lr, xn_j, yn_j, 0, T, U) ** 2).sum()
    )(xs[:STU])
    np.testing.assert_allclose(g[:STU], np.asarray(g_exact), atol=1e-6)


def test_compact_public_api_with_kernel_path(monkeypatch):
    """rnnt_loss(compact=True) with the movement kernel forced reproduces
    the golden costs and grads."""
    from warp_rnnt_tpu import rnnt_loss
    from test_compact import EXPECTED_COMPACT_GRADS, _pack

    monkeypatch.setattr(compact_mod, "_FORCE_KERNEL", True)
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


def test_compact_kernel_path_under_jit(monkeypatch):
    from warp_rnnt_tpu import rnnt_loss
    from test_compact import _pack

    monkeypatch.setattr(compact_mod, "_FORCE_KERNEL", True)
    packed, packed_ys, xn, yn = _pack(golden.FORWARD_BATCH)

    @jax.jit
    def f(x, y, xn_, yn_):
        return rnnt_loss(
            x, y, xn_, yn_, compact=True, impl="scan",
            max_frames=3, max_labels=2,
        )

    costs = f(jnp.asarray(packed), jnp.asarray(packed_ys),
              jnp.asarray(xn), jnp.asarray(yn))
    np.testing.assert_allclose(
        np.asarray(costs), golden.FORWARD_BATCH["expected_costs"],
        rtol=1e-4, atol=2e-5,
    )
