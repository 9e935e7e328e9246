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
