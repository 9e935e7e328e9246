"""The auto-routed joint+loss surface: every layout computes the same
function; "auto" picks the measured winner for the backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warp_rnnt_tpu import rnnt_loss_joint
from warp_rnnt_tpu.functional.joint_loss import (
    joint_layout_route,
    pack_joint_metadata,
)


def _setup(mode="add", seed=0):
    rng = np.random.RandomState(seed)
    N, T, U1, F, H, V = 3, 10, 4, 6, 16, 33
    f = jnp.asarray(rng.randn(N, T, F).astype(np.float32)) * 0.4
    g = jnp.asarray(rng.randn(N, U1, F).astype(np.float32)) * 0.4
    Fin = 2 * F if mode == "concat" else F
    params = dict(
        w_pre=jnp.asarray(rng.randn(Fin, H).astype(np.float32)) * 0.3,
        b_pre=jnp.asarray(rng.randn(H).astype(np.float32)) * 0.1,
        w_out=jnp.asarray(rng.randn(H, V).astype(np.float32)) * 0.3,
        b_out=jnp.asarray(rng.randn(V).astype(np.float32)) * 0.1,
    )
    ys = jnp.asarray(rng.randint(1, V, (N, U1 - 1)).astype(np.int32))
    xn = jnp.asarray(np.array([10, 7, 4], np.int32))
    yn = jnp.asarray(np.array([3, 1, 0], np.int32))
    return f, g, params, ys, xn, yn


@pytest.mark.parametrize("mode", ["add", "concat"])
def test_all_layouts_agree(mode):
    f, g, params, ys, xn, yn = _setup(mode)
    costs = {
        layout: np.asarray(rnnt_loss_joint(
            f, g, params, ys, xn, yn, mode=mode, layout=layout
        ))
        for layout in ("fused", "padded", "compact")
    }
    for layout, c in costs.items():
        np.testing.assert_allclose(
            c, costs["padded"], rtol=2e-3, atol=2e-3, err_msg=layout
        )


def test_auto_routes_and_matches():
    f, g, params, ys, xn, yn = _setup()
    route = joint_layout_route(10, 4, 16, 33)
    assert route in ("fused", "padded")
    # off-TPU the auto route must avoid the interpreted Pallas kernel
    if jax.default_backend() != "tpu":
        assert route == "padded"
    got = np.asarray(rnnt_loss_joint(f, g, params, ys, xn, yn, layout="auto"))
    want = np.asarray(rnnt_loss_joint(f, g, params, ys, xn, yn, layout=route))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_gradients_agree_across_layouts():
    f, g, params, ys, xn, yn = _setup()

    def loss(layout, p, ff, gg):
        return rnnt_loss_joint(ff, gg, p, ys, xn, yn, reduction="sum",
                               layout=layout)

    ref = jax.grad(lambda p, ff, gg: loss("padded", p, ff, gg),
                   argnums=(0, 1, 2))(params, f, g)
    for layout in ("fused", "compact"):
        got = jax.grad(lambda p, ff, gg: loss(layout, p, ff, gg),
                       argnums=(0, 1, 2))(params, f, g)
        for want_leaf, got_leaf in zip(jax.tree_util.tree_leaves(ref),
                                       jax.tree_util.tree_leaves(got)):
            np.testing.assert_allclose(
                np.asarray(got_leaf), np.asarray(want_leaf),
                rtol=5e-2, atol=5e-3, err_msg=layout,
            )


def test_reductions_and_average_frames():
    f, g, params, ys, xn, yn = _setup()
    none = rnnt_loss_joint(f, g, params, ys, xn, yn, layout="padded")
    mean = rnnt_loss_joint(f, g, params, ys, xn, yn, layout="padded",
                           reduction="mean")
    np.testing.assert_allclose(float(mean), float(np.mean(np.asarray(none))),
                               rtol=1e-6)
    af = rnnt_loss_joint(f, g, params, ys, xn, yn, layout="padded",
                         average_frames=True)
    np.testing.assert_allclose(
        np.asarray(af), np.asarray(none) / np.asarray(xn), rtol=1e-6
    )


def test_pack_joint_metadata():
    xn = np.array([3, 2], np.int32)
    yn = np.array([1, 0], np.int32)
    n_idx, t_idx, u_idx = pack_joint_metadata(xn, yn)
    assert n_idx.shape[0] == 3 * 2 + 2 * 1
    np.testing.assert_array_equal(
        np.asarray(n_idx), [0, 0, 0, 0, 0, 0, 1, 1]
    )
    np.testing.assert_array_equal(
        np.asarray(t_idx), [0, 0, 1, 1, 2, 2, 0, 1]
    )
    np.testing.assert_array_equal(
        np.asarray(u_idx), [0, 1, 0, 1, 0, 1, 0, 0]
    )


def test_unknown_layout_raises():
    f, g, params, ys, xn, yn = _setup()
    with pytest.raises(ValueError, match="unknown layout"):
        rnnt_loss_joint(f, g, params, ys, xn, yn, layout="nope")


def test_auto_route_is_lowering_time_per_platform(monkeypatch):
    """layout="auto" above the fused boundary resolves the platform at
    LOWERING time (round-4 verdict item 3): a ("tpu",) export carries the
    fused Mosaic kernel, a ("cpu",) export of the SAME call carries none
    and executes as the padded program — so multi-platform artifacts can
    never bake the export host's backend answer."""
    from warp_rnnt_tpu.functional import joint_loss

    # shrink the boundary so the tiny test shape routes "fused on tpu"
    monkeypatch.setattr(joint_loss, "_FUSED_MIN_V", 1)
    f, g, params, ys, xn, yn = _setup()
    assert joint_layout_route(10, 4, 16, 33, platform="tpu") == "fused"
    assert joint_layout_route(10, 4, 16, 33, platform="cpu") == "padded"

    def fn(f, g, params):
        return rnnt_loss_joint(f, g, params, ys, xn, yn, layout="auto")

    exp_tpu = jax.export.export(jax.jit(fn), platforms=("tpu",))(
        f, g, params
    )
    assert "tpu_custom_call" in exp_tpu.mlir_module()

    exp_cpu = jax.export.export(jax.jit(fn), platforms=("cpu",))(
        f, g, params
    )
    assert "tpu_custom_call" not in exp_cpu.mlir_module()
    want = np.asarray(
        rnnt_loss_joint(f, g, params, ys, xn, yn, layout="padded")
    )
    np.testing.assert_allclose(
        np.asarray(exp_cpu.call(f, g, params)), want, rtol=1e-3, atol=5e-3
    )

    # plain jit on the cpu backend prunes the Mosaic branch and runs padded
    got = np.asarray(jax.jit(fn)(f, g, params))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-3)


def test_route_default_platform_is_runtime_backend():
    """A DIRECT caller on a CPU-only host must never be routed into the
    interpreted Pallas kernel: with platform unspecified the route resolves
    against jax.default_backend() at call time, even at fused-territory V
    (>= _FUSED_MIN_V).  Explicit platforms still answer for that platform."""
    V_big = 4096  # comfortably above _FUSED_MIN_V
    if jax.default_backend() != "tpu":
        assert joint_layout_route(10, 4, 16, V_big) == "padded"
    assert joint_layout_route(10, 4, 16, V_big, platform="tpu") == "fused"
    assert joint_layout_route(10, 4, 16, V_big, platform="cpu") == "padded"


def test_compute_dtype_fp32_padded_and_auto():
    """compute_dtype=float32 gives full-precision joint numerics on the
    padded and compact branches, auto routes it away from the bf16-only
    fused kernel, and layout='fused' rejects it loudly."""
    f, g, params, ys, xn, yn = _setup()

    def fp32_reference():
        # plain fp32 numpy-free reference: tanh MLP joint + from-logits loss
        from warp_rnnt_tpu.functional.from_logits import rnnt_loss_from_logits
        h = (f[:, :, None, :] + g[:, None, :, :]) @ params["w_pre"]
        h = jnp.tanh(h + params["b_pre"])
        logits = h @ params["w_out"] + params["b_out"]
        return rnnt_loss_from_logits(logits, ys, xn, yn)

    want = np.asarray(fp32_reference())
    got_padded = np.asarray(rnnt_loss_joint(
        f, g, params, ys, xn, yn, layout="padded",
        compute_dtype=jnp.float32))
    np.testing.assert_allclose(got_padded, want, rtol=1e-5, atol=1e-5)
    got_auto = np.asarray(rnnt_loss_joint(
        f, g, params, ys, xn, yn, layout="auto",
        compute_dtype=jnp.float32))
    np.testing.assert_allclose(got_auto, got_padded, rtol=1e-6)
    got_compact = np.asarray(rnnt_loss_joint(
        f, g, params, ys, xn, yn, layout="compact",
        compute_dtype=jnp.float32))
    np.testing.assert_allclose(got_compact, want, rtol=1e-5, atol=1e-5)
    # the bf16 default agrees to bf16 tolerance with the fp32 program
    got_bf16 = np.asarray(rnnt_loss_joint(
        f, g, params, ys, xn, yn, layout="padded"))
    np.testing.assert_allclose(got_bf16, want, rtol=2e-2, atol=2e-2)
    with pytest.raises(ValueError, match="bf16"):
        rnnt_loss_joint(f, g, params, ys, xn, yn, layout="fused",
                        compute_dtype=jnp.float32)
