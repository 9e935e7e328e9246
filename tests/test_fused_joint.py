"""Fused joint+loss Pallas kernel (interpret mode on CPU): forward parity
with the unfused XLA composition, gradient parity through all four joint
parameters, and the public `rnnt_loss_fused_joint` wrapper vs the flax
Joint + from-logits path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warp_rnnt_tpu.functional.core import rnnt_core
from warp_rnnt_tpu.ops.fused_joint import (
    _labels_ext,
    fused_joint_core,
    joint_lattice_fwd,
    rnnt_loss_fused_joint,
)


def _setup(N=2, T=10, U=5, V=33, H=16, blank=0, seed=0):
    rng = np.random.RandomState(seed)
    a = jnp.asarray(rng.randn(N, T, H).astype(np.float32)) * 0.3
    c = jnp.asarray(rng.randn(N, U, H).astype(np.float32)) * 0.3
    w = jnp.asarray(rng.randn(H, V).astype(np.float32)) * 0.2
    b = jnp.asarray(rng.randn(V).astype(np.float32)) * 0.1
    labels = jnp.asarray(rng.randint(1, V, (N, U - 1)).astype(np.int32))
    xn = jnp.asarray(rng.randint(U, T + 1, size=N).astype(np.int32))
    yn = jnp.asarray(rng.randint(1, U, size=N).astype(np.int32))
    return a, c, w, b, labels, xn, yn


def _ref_lattice(a, c, w, b, labels, blank):
    N, T, H = a.shape
    U = c.shape[1]
    V = w.shape[1]
    h = jnp.tanh(a[:, :, None, :] + c[:, None, :, :])
    z = jax.lax.dot_general(
        h.astype(jnp.bfloat16).reshape(-1, H), w.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(N, T, U, V) + b
    lab = _labels_ext(labels, blank, N)
    lz = jax.nn.logsumexp(z, -1)
    bl = z[..., blank]
    el = jnp.take_along_axis(
        z, jnp.broadcast_to(lab[:, None, :, None], (N, T, U, 1)), -1
    )[..., 0]
    return bl, el, lz


@pytest.mark.parametrize("blank", [0, 3])
@pytest.mark.parametrize(
    "shape",
    [
        (2, 10, 5, 33, 16),
        (1, 17, 9, 40, 24),
        # U > 32: the label axis is never grid-blocked (whole-U tiling,
        # see ops/fused_joint.py) — this pins its semantics at a size the
        # hardware gate also covers (tpu_check large-U case)
        (1, 41, 37, 29, 16),
    ],
)
def test_lattice_forward_parity(shape, blank):
    """Kernel blank/emit/logZ == unfused composition, including non-divisible
    T/U (block-edge padding) and nonzero blank."""
    a, c, w, b, labels, xn, yn = _setup(*shape, blank=blank)
    N, T, _ = a.shape
    U = c.shape[1]
    lab = _labels_ext(labels, blank, N)
    bl_r, el_r, lz_r = _ref_lattice(a, c, w, b, labels, blank)
    # full lengths: every tile live, so parity covers the whole lattice
    full_xn = jnp.full((N,), T, jnp.int32)
    full_yn = jnp.full((N,), U - 1, jnp.int32)
    bl_k, el_k, lz_k = joint_lattice_fwd(a, c, w, b, lab, full_xn, full_yn,
                                         blank)
    np.testing.assert_allclose(np.asarray(bl_k), np.asarray(bl_r), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(el_k), np.asarray(el_r), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lz_k), np.asarray(lz_r), rtol=1e-6, atol=1e-5)


def test_costs_and_grads_match_unfused():
    a, c, w, b, labels, xn, yn = _setup()

    def ref(a, c, w, b):
        bl, el, lz = _ref_lattice(a, c, w, b, labels, 0)
        return rnnt_core(
            jnp.stack([bl - lz, el - lz], -1), xn, yn, 0.0, "scan"
        ).sum()

    def fused(a, c, w, b):
        return fused_joint_core(a, c, w, b, labels, xn, yn, 0, 0.0, "scan").sum()

    np.testing.assert_allclose(float(fused(a, c, w, b)), float(ref(a, c, w, b)),
                               rtol=1e-5)
    gr = jax.grad(ref, argnums=(0, 1, 2, 3))(a, c, w, b)
    gk = jax.grad(fused, argnums=(0, 1, 2, 3))(a, c, w, b)
    for name, r, k in zip(("da", "dc", "dw", "db"), gr, gk):
        r, k = np.asarray(r), np.asarray(k)
        assert np.isfinite(k).all(), name
        np.testing.assert_allclose(
            k, r, rtol=5e-2, atol=max(2e-2 * np.abs(r).max(), 1e-5),
            err_msg=name,
        )


def test_grads_zero_outside_valid_region():
    """Cells beyond (xn, yn) contribute nothing: d_a rows past xn and d_c
    rows past yn+1 must be exactly zero."""
    a, c, w, b, labels, xn, yn = _setup(N=2, T=12, U=6)
    xn = jnp.array([8, 6], jnp.int32)
    yn = jnp.array([3, 2], jnp.int32)
    da, dc = jax.grad(
        lambda a, c: fused_joint_core(
            a, c, w, b, labels, xn, yn, 0, 0.0, "scan"
        ).sum(),
        argnums=(0, 1),
    )(a, c)
    da, dc = np.asarray(da), np.asarray(dc)
    np.testing.assert_array_equal(da[0, 8:], 0.0)
    np.testing.assert_array_equal(da[1, 6:], 0.0)
    np.testing.assert_array_equal(dc[0, 4:], 0.0)
    np.testing.assert_array_equal(dc[1, 3:], 0.0)


def test_public_wrapper_matches_flax_joint():
    """rnnt_loss_fused_joint == Joint(normalize=False) + rnnt_loss_from_logits
    with the same parameters, for both loss and input gradients."""
    from warp_rnnt_tpu.functional.from_logits import rnnt_loss_from_logits
    from warp_rnnt_tpu.models.joint import Joint

    rng = np.random.RandomState(3)
    N, T, U, V, H, F = 2, 9, 4, 29, 16, 12
    f = jnp.asarray(rng.randn(N, T, F).astype(np.float32)) * 0.4
    g = jnp.asarray(rng.randn(N, U, F).astype(np.float32)) * 0.4
    labels = jnp.asarray(rng.randint(1, V, (N, U - 1)).astype(np.int32))
    xn = jnp.array([9, 7], jnp.int32)
    yn = jnp.array([3, 2], jnp.int32)

    import flax.linen as nn

    joint = Joint(vocab_size=V, hidden=H)
    variables = joint.init(jax.random.PRNGKey(0), f, g)
    p = nn.unbox(variables)["params"]
    params = dict(
        w_pre=p["pre"]["kernel"], b_pre=p["pre"]["bias"],
        w_out=p["out"]["kernel"], b_out=p["out"]["bias"],
    )

    def unfused(f, g):
        logits = joint.apply(variables, f, g, normalize=False)
        return rnnt_loss_from_logits(
            logits, labels, xn, yn, reduction="sum", impl="scan"
        )

    def fused(f, g):
        return rnnt_loss_fused_joint(
            f, g, params, labels, xn, yn, reduction="sum", impl="scan"
        )

    lr, (gfr, ggr) = jax.value_and_grad(unfused, argnums=(0, 1))(f, g)
    lk, (gfk, ggk) = jax.value_and_grad(fused, argnums=(0, 1))(f, g)
    np.testing.assert_allclose(float(lk), float(lr), rtol=2e-3)
    np.testing.assert_allclose(np.asarray(gfk), np.asarray(gfr), rtol=0.1,
                               atol=2e-2 * float(np.abs(np.asarray(gfr)).max()))
    np.testing.assert_allclose(np.asarray(ggk), np.asarray(ggr), rtol=0.1,
                               atol=2e-2 * float(np.abs(np.asarray(ggr)).max()))


def test_fused_joint_under_jit():
    a, c, w, b, labels, xn, yn = _setup()
    f = jax.jit(
        lambda a, c: fused_joint_core(a, c, w, b, labels, xn, yn, 0, 0.0, "scan")
    )
    eager = fused_joint_core(a, c, w, b, labels, xn, yn, 0, 0.0, "scan")
    np.testing.assert_allclose(np.asarray(f(a, c)), np.asarray(eager), rtol=1e-6)


def test_model_train_path_fused_matches_from_logits():
    """transducer_loss_fn(loss_mode='fused') == 'from_logits' through the
    full model (encoder + predictor + joint), value and parameter grads."""
    import jax.tree_util as jtu

    from warp_rnnt_tpu.models.transducer import init_model, transducer_loss_fn

    model, params, batch = init_model(
        jax.random.PRNGKey(1), vocab_size=23, feat_dim=8, N=2, T=10, U=4,
        encoder_hidden=16, predictor_hidden=16, joint_hidden=16,
    )
    lr, gr = jax.value_and_grad(
        lambda p: transducer_loss_fn(model, p, batch,
                                     loss_mode="from_logits")
    )(params)
    lk, gk = jax.value_and_grad(
        lambda p: transducer_loss_fn(model, p, batch, loss_mode="fused")
    )(params)
    np.testing.assert_allclose(float(lk), float(lr), rtol=2e-3)
    flat_r = jtu.tree_leaves_with_path(gr)
    flat_k = {jtu.keystr(kp): v for kp, v in jtu.tree_leaves_with_path(gk)}
    for kp, r in flat_r:
        k = flat_k[jtu.keystr(kp)]
        r, k = np.asarray(r), np.asarray(k)
        assert np.isfinite(k).all(), jtu.keystr(kp)
        np.testing.assert_allclose(
            k, r, rtol=0.1, atol=max(3e-2 * np.abs(r).max(), 1e-5),
            err_msg=jtu.keystr(kp),
        )


def test_ragged_tile_skip_exactness():
    """Very short lengths (most tiles dead): skipped tiles emit zeros, and
    costs/grads are bit-identical to a run with full-length tile liveness
    (the loss core only reads cells inside the lengths)."""
    a, c, w, b, labels, xn, yn = _setup(N=3, T=40, U=9, V=50, H=16, seed=7)
    N, T, _ = a.shape
    U = c.shape[1]
    xn = jnp.asarray(np.array([3, 40, 11], np.int32))
    yn = jnp.asarray(np.array([1, 8, 0], np.int32))
    lab = _labels_ext(labels, 0, N)

    bl_s, el_s, lz_s = joint_lattice_fwd(a, c, w, b, lab, xn, yn, 0)
    full = (jnp.full((N,), T, jnp.int32), jnp.full((N,), U - 1, jnp.int32))
    bl_f, el_f, lz_f = joint_lattice_fwd(a, c, w, b, lab, *full, 0)
    # dead tiles (t-tiles fully past xn) come back exactly zero
    from warp_rnnt_tpu.ops.fused_joint import _tiles

    BT, _ = _tiles(T, U)
    assert np.all(np.asarray(bl_s)[0, BT:] == 0.0)  # xn=3 < BT -> tiles 1+ dead
    assert np.all(np.asarray(lz_s)[0, BT:] == 0.0)
    # live cells agree with the full-liveness run
    np.testing.assert_array_equal(np.asarray(bl_s)[1], np.asarray(bl_f)[1])

    def loss(a, c, w, b, skip):
        return fused_joint_core(a, c, w, b, labels, xn, yn, 0, 0.0,
                                "scan").sum() * skip

    v_s, g_s = jax.value_and_grad(
        lambda *p: loss(*p, 1.0), argnums=(0, 1, 2, 3))(a, c, w, b)
    # unfused reference, masked by the same lengths via the core
    def ref(a, c, w, b):
        bl, el, lz = _ref_lattice(a, c, w, b, labels, 0)
        return rnnt_core(
            jnp.stack([bl - lz, el - lz], -1), xn, yn, 0.0, "scan"
        ).sum()

    v_r, g_r = jax.value_and_grad(ref, argnums=(0, 1, 2, 3))(a, c, w, b)
    np.testing.assert_allclose(float(v_s), float(v_r), rtol=1e-5)
    for name, r, k in zip(("da", "dc", "dw", "db"), g_r, g_s):
        r, k = np.asarray(r), np.asarray(k)
        assert np.isfinite(k).all(), name
        np.testing.assert_allclose(
            k, r, rtol=5e-2, atol=max(2e-2 * np.abs(r).max(), 1e-5),
            err_msg=name,
        )


def test_vblocked_kernels_match_single_block(monkeypatch):
    """LLM-scale vocabularies route to the V-grid-blocked kernels (running
    logsumexp forward; split da/dc + dw/db backward).  Forcing a tiny
    V-block (BV=128 over V=300 -> 3 blocks, with a padded tail block) must
    reproduce the single-block kernel's loss and all four gradients."""
    import warp_rnnt_tpu.ops.fused_joint as fj

    a, c, w, b, labels, xn, yn = _setup(N=2, T=11, U=5, V=300, H=16, seed=9)

    def vg(a, c, w, b):
        return jax.value_and_grad(
            lambda a, c, w, b: fused_joint_core(
                a, c, w, b, labels, xn, yn, 0, 0.0, "scan"
            ).sum(),
            argnums=(0, 1, 2, 3),
        )(a, c, w, b)

    assert fj._select_bv(11, 5, 16, 300) is None  # single-block by default
    l1, g1 = vg(a, c, w, b)
    monkeypatch.setattr(fj, "_FORCE_BV", 128)
    assert fj._select_bv(11, 5, 16, 300) == 128
    l2, g2 = vg(a, c, w, b)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    for name, r, k in zip(("da", "dc", "dw", "db"), g1, g2):
        r, k = np.asarray(r), np.asarray(k)
        assert np.isfinite(k).all(), name
        np.testing.assert_allclose(
            k, r, rtol=5e-3, atol=max(1e-3 * np.abs(r).max(), 1e-6),
            err_msg=name,
        )
    # sanity: an LLM-scale vocab really is routed to the blocked kernels
    monkeypatch.setattr(fj, "_FORCE_BV", None)
    assert fj._select_bv(150, 21, 256, 64000) in fj._BV_CANDIDATES
