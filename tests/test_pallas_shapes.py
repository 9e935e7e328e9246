"""Shape-sweep hardening: the pallas column kernel must agree with the scan
backend on adversarial shapes — single-frame/single-row lattices, sizes
straddling the 128-lane tile boundary, and U crossing the BU column-block
boundary (the multi-column kernel processes up to 8 columns per grid step)."""

import numpy as np
import pytest
import jax.numpy as jnp

from warp_rnnt_tpu.functional import scan_impl
from warp_rnnt_tpu.ops import pallas_impl

import golden


SHAPES = [
    # (N, T, U)  — U here is lattice rows (= labels + 1)
    (1, 1, 1),     # single cell
    (1, 1, 4),     # one frame, several labels (only t=0 emissions)
    (1, 5, 1),     # empty target: blank-only path
    (3, 7, 9),     # tiny ragged
    (2, 127, 3),   # just under the lane tile
    (2, 128, 3),   # exactly one lane tile
    (2, 129, 3),   # just over -> T_pad = 256
    (1, 150, 8),   # BU boundary: 8 rows = exactly one column block
    (1, 150, 9),   # 9 rows = one full block + 1 (pad column exercised)
    (9, 40, 17),   # N not a multiple of 8 (sublane padding)
]


@pytest.mark.parametrize("N,T,U", SHAPES)
def test_pallas_matches_scan_on_shape(N, T, U):
    rng = np.random.RandomState(N * 1000 + T * 10 + U)
    blank = np.log(rng.rand(N, T, U).astype(np.float32) + 1e-6)
    emit = np.log(rng.rand(N, T, U).astype(np.float32) + 1e-6)
    xn = rng.randint(1, T + 1, size=(N,)).astype(np.int32)
    xn[0] = T
    yn = rng.randint(0, U, size=(N,)).astype(np.int32)
    yn[0] = U - 1

    args = (jnp.asarray(blank), jnp.asarray(emit),
            jnp.asarray(xn), jnp.asarray(yn))
    c_s, gb_s, ge_s, _, _ = scan_impl.forward_backward(*args)
    c_p, gb_p, ge_p, _, _ = pallas_impl.forward_backward(*args)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_s),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_s),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ge_p), np.asarray(ge_s),
                               rtol=2e-4, atol=2e-5)
    # beta-only inference path agrees too
    np.testing.assert_allclose(
        np.asarray(pallas_impl.costs_only(*args)),
        np.asarray(scan_impl.costs_only(*args)),
        rtol=2e-5, atol=2e-5,
    )
