"""The torch front-end must reproduce the reference test suite behavior:
same golden values, same validation error messages, same autograd contract."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from warp_rnnt_tpu.bindings.torch_binding import rnnt_loss

import golden


def _t(case):
    return (
        torch.tensor(np.asarray(case["xs"]), dtype=torch.float32),
        torch.tensor(case["ys"], dtype=torch.int32),
        torch.tensor(case["xn"], dtype=torch.int32),
        torch.tensor(case["yn"], dtype=torch.int32),
    )


def test_contiguous():
    xs = torch.zeros((4, 3, 2, 1), dtype=torch.float32).transpose(0, 1)
    with pytest.raises(RuntimeError, match="xs must be contiguous"):
        rnnt_loss(xs, torch.zeros((3, 1), dtype=torch.int32),
                  torch.zeros(3, dtype=torch.int32), torch.zeros(3, dtype=torch.int32))


def test_shape():
    with pytest.raises(RuntimeError, match="xs must have 4 dimensions"):
        rnnt_loss(torch.zeros(3), torch.zeros((1, 1), dtype=torch.int32),
                  torch.zeros(1, dtype=torch.int32), torch.zeros(1, dtype=torch.int32))


def test_type():
    with pytest.raises(RuntimeError, match="ys must be a Int tensor"):
        rnnt_loss(torch.zeros((1, 2, 2, 3)), torch.zeros((1, 1), dtype=torch.long),
                  torch.zeros(1, dtype=torch.int32), torch.zeros(1, dtype=torch.int32))


@pytest.mark.parametrize("name", sorted(golden.ALL_PADDED_CASES))
@pytest.mark.parametrize("gather", [False, True])
def test_golden_with_backward(name, gather):
    case = golden.ALL_PADDED_CASES[name]
    xs, ys, xn, yn = _t(case)
    xs.requires_grad_(True)
    costs = rnnt_loss(xs, ys, xn, yn, gather=gather)
    np.testing.assert_allclose(
        costs.detach().numpy(), case["expected_costs"], rtol=1e-4, atol=2e-5
    )
    costs.sum().backward()
    np.testing.assert_allclose(
        xs.grad.numpy(), case["expected_grads"], rtol=1e-4, atol=2e-5
    )


def test_compact_golden():
    case = golden.FORWARD_BATCH
    xs, ys, xn, yn = _t(case)
    V = xs.size(-1)
    packed = torch.cat(
        [xs[i, : xn[i], : yn[i] + 1].reshape(-1, V) for i in range(xs.size(0))]
    ).contiguous()
    packed_ys = torch.cat([ys[i, : yn[i]] for i in range(ys.size(0))]).contiguous()
    packed.requires_grad_(True)
    costs = rnnt_loss(packed, packed_ys, xn, yn, compact=True)
    np.testing.assert_allclose(
        costs.detach().numpy(), case["expected_costs"], rtol=1e-4, atol=2e-5
    )
    costs.sum().backward()
    from test_compact import EXPECTED_COMPACT_GRADS

    np.testing.assert_allclose(
        packed.grad.numpy(), EXPECTED_COMPACT_GRADS, rtol=1e-4, atol=2e-5
    )


def test_input_grad_asserts():
    """Reference parity: labels/lengths must not require grad
    (`pytorch_binding/warp_rnnt/__init__.py:105-107`)."""
    case = golden.FORWARD_BATCH
    xs, ys, xn, yn = _t(case)
    bad_ys = ys.float().requires_grad_(True)
    with pytest.raises(AssertionError, match="labels does not require gradients"):
        rnnt_loss(xs, bad_ys, xn, yn)
    bad_xn = xn.float().requires_grad_(True)
    with pytest.raises(
        AssertionError, match="frames_lengths does not require gradients"
    ):
        rnnt_loss(xs, ys, bad_xn, yn)
    bad_yn = yn.float().requires_grad_(True)
    with pytest.raises(
        AssertionError, match="labels_lengths does not require gradients"
    ):
        rnnt_loss(xs, ys, xn, bad_yn)


def test_compact_no_grad_skips_alpha_sweep(monkeypatch):
    """Under torch.no_grad() the compact path must run the beta-only
    inference sweep — never the alpha+grads forward-backward (reference
    `__init__.py:115`, `core_compact.cu:371-378`).  Proven by making the
    forward-backward entry explode."""
    import warp_rnnt_tpu.functional.core as core

    def _boom(*a, **k):
        raise AssertionError("alpha+grads sweep ran under torch.no_grad()")

    monkeypatch.setattr(core, "_forward_backward", _boom)

    case = golden.FORWARD_BATCH
    xs, ys, xn, yn = _t(case)
    V = xs.size(-1)
    packed = torch.cat(
        [xs[i, : xn[i], : yn[i] + 1].reshape(-1, V) for i in range(xs.size(0))]
    ).contiguous()
    packed_ys = torch.cat([ys[i, : yn[i]] for i in range(ys.size(0))]).contiguous()
    packed.requires_grad_(True)
    with torch.no_grad():
        costs = rnnt_loss(packed, packed_ys, xn, yn, compact=True)
    np.testing.assert_allclose(
        costs.numpy(), case["expected_costs"], rtol=1e-4, atol=2e-5
    )
    # ... and with grad enabled the same monkeypatched call must hit it
    with pytest.raises(AssertionError, match="sweep ran"):
        rnnt_loss(packed, packed_ys, xn, yn, compact=True)


def test_reductions():
    case = golden.FORWARD_BATCH
    xs, ys, xn, yn = _t(case)
    c = rnnt_loss(xs, ys, xn, yn)
    s = rnnt_loss(xs, ys, xn, yn, reduction="sum")
    m = rnnt_loss(xs, ys, xn, yn, reduction="mean", average_frames=True)
    np.testing.assert_allclose(float(s), float(c.sum()), rtol=1e-6)
    np.testing.assert_allclose(
        float(m), float((c / xn.to(c)).mean()), rtol=1e-6
    )


# ---- fused joint+loss front-end (beyond-reference capability) ---------------


def _fused_setup(seed=0, N=2, T=9, U=4, F=12, H=16, V=25):
    rng = np.random.RandomState(seed)
    f = torch.tensor(rng.randn(N, T, F).astype(np.float32) * 0.3)
    g = torch.tensor(rng.randn(N, U, F).astype(np.float32) * 0.3)
    params = {
        "w_pre": torch.tensor(rng.randn(F, H).astype(np.float32) * 0.2),
        "b_pre": torch.tensor(rng.randn(H).astype(np.float32) * 0.1),
        "w_out": torch.tensor(rng.randn(H, V).astype(np.float32) * 0.2),
        "b_out": torch.tensor(rng.randn(V).astype(np.float32) * 0.1),
    }
    labels = torch.tensor(rng.randint(1, V, (N, U - 1)).astype(np.int32))
    xn = torch.tensor(rng.randint(U, T + 1, size=N).astype(np.int32))
    yn = torch.tensor(rng.randint(1, U, size=N).astype(np.int32))
    return f, g, params, labels, xn, yn


def test_fused_joint_bridge_exact_parity_with_jax():
    """The torch front-end must be numerically IDENTICAL to the JAX fused
    path (same computation through the bridge), costs and all six grads."""
    import jax
    import jax.numpy as jnp

    from warp_rnnt_tpu.bindings.torch_binding import rnnt_loss_fused_joint
    from warp_rnnt_tpu.ops.fused_joint import (
        rnnt_loss_fused_joint as jax_fused,
    )

    f, g, params, labels, xn, yn = _fused_setup()
    for t in (f, g, *params.values()):
        t.requires_grad_(True)

    loss = rnnt_loss_fused_joint(
        f, g, params, labels, xn, yn, reduction="mean", fastemit_lambda=0.01
    )
    loss.backward()

    to_j = lambda t: jnp.asarray(t.detach().numpy())
    jf, jg = to_j(f), to_j(g)
    jp = {k: to_j(v) for k, v in params.items()}
    jl = jnp.asarray(labels.numpy())
    jxn, jyn = jnp.asarray(xn.numpy()), jnp.asarray(yn.numpy())

    def jax_loss(jf, jg, jp):
        return jax_fused(jf, jg, jp, jl, jxn, jyn, reduction="mean",
                         fastemit_lambda=0.01)

    jloss, (gjf, gjg, gjp) = jax.value_and_grad(jax_loss, argnums=(0, 1, 2))(
        jf, jg, jp
    )
    np.testing.assert_allclose(float(loss), float(jloss), rtol=1e-6)
    np.testing.assert_allclose(f.grad.numpy(), np.asarray(gjf), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(g.grad.numpy(), np.asarray(gjg), rtol=1e-6, atol=1e-7)
    for k in params:
        np.testing.assert_allclose(
            params[k].grad.numpy(), np.asarray(gjp[k]), rtol=1e-6, atol=1e-7,
            err_msg=k,
        )


def test_fused_joint_matches_torch_unfused_reference():
    """Semantics: the fused op ~= torch-side tanh-joint -> log_softmax ->
    padded rnnt_loss (loose tolerance: the kernel's V-matmul runs in bf16)."""
    from warp_rnnt_tpu.bindings.torch_binding import (
        rnnt_loss,
        rnnt_loss_fused_joint,
    )

    f, g, params, labels, xn, yn = _fused_setup(seed=3)
    costs_fused = rnnt_loss_fused_joint(f, g, params, labels, xn, yn)

    h = torch.tanh(
        (f @ params["w_pre"] + params["b_pre"]).unsqueeze(2)
        + (g @ params["w_pre"]).unsqueeze(1)
    )
    log_probs = torch.log_softmax(h @ params["w_out"] + params["b_out"], -1)
    costs_ref = rnnt_loss(log_probs.contiguous(), labels, xn, yn)
    np.testing.assert_allclose(
        costs_fused.detach().numpy(), costs_ref.detach().numpy(),
        rtol=5e-3, atol=5e-3,
    )


def test_rnnt_loss_joint_layouts_agree_and_backprop():
    """The torch routed surface: every layout computes the same function and
    gradients flow to inputs and all four parameters."""
    from warp_rnnt_tpu.bindings.torch_binding import rnnt_loss_joint

    f, g, params, labels, xn, yn = _fused_setup(seed=5)
    for t in (f, g, *params.values()):
        t.requires_grad_(True)
    costs = {
        lay: rnnt_loss_joint(f, g, params, labels, xn, yn, layout=lay)
        for lay in ("auto", "fused", "padded", "compact")
    }
    for lay, c in costs.items():
        np.testing.assert_allclose(
            c.detach().numpy(), costs["padded"].detach().numpy(),
            rtol=2e-3, atol=2e-3, err_msg=lay,
        )
    total = costs["auto"].sum()
    total.backward()
    for t in (f, g, *params.values()):
        assert t.grad is not None
        assert torch.isfinite(t.grad).all()
