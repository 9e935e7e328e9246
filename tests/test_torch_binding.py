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
