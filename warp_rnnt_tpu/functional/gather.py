"""Blank/label gather with a dense (scatter-free) VJP.

The padded and compact paths both reduce the vocabulary axis early: from each
row of ``(R, V)`` log-probs only the blank entry and one label entry survive
(`pytorch_binding/warp_rnnt/__init__.py:118-128`, `core_compact.cu:403-436`).
Differentiating a plain ``take_along_axis`` makes XLA emit a scatter-add into
the (R, V) cotangent, which is catastrophically slow on TPU (measured ~10x
the bandwidth cost on the headline config).  Since every row receives at most
two nonzeros at *known* columns, the VJP is instead written as a fused
broadcast-compare-select:

    d_xs[r, v] = ct[r, 0] * [v == blank] + ct[r, 1] * [v == loc[r]]

one elementwise pass at HBM write bandwidth, no scatter.  When
``loc[r] == blank`` (terminal lattice rows) both terms accumulate, matching
the scatter-add semantics of the reference autograd gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_blank_label(xs, loc, blank: int):
    """xs (..., V), loc (...,) int32 -> (..., 2): [blank entry, loc entry].

    The forward is a last-axis ``take_along_axis`` plus a static blank slice —
    measured fastest layout-preserving form on TPU (row-flattened gathers
    force a relayout and run ~6x slower).
    """
    blank_col = xs[..., blank]
    label_col = jnp.take_along_axis(
        xs, loc[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    return jnp.stack([blank_col, label_col], axis=-1)


def _gather_fwd(xs, loc, blank):
    dtype_tag = jnp.zeros((0,), xs.dtype)  # carries static dtype through residuals
    return gather_blank_label(xs, loc, blank), (loc, xs.shape[-1], dtype_tag)


def _gather_bwd(blank, res, ct):
    loc, V, dtype_tag = res
    v_iota = jnp.arange(V, dtype=jnp.int32)
    v_shape = (1,) * loc.ndim + (V,)
    v_iota = v_iota.reshape(v_shape)
    ct = ct.astype(jnp.float32)
    d_xs = ct[..., 0:1] * (v_iota == blank) + ct[..., 1:2] * (
        v_iota == loc[..., None]
    )
    return d_xs.astype(dtype_tag.dtype), np.zeros(loc.shape, dtype=jax.dtypes.float0)


gather_blank_label.defvjp(_gather_fwd, _gather_bwd)
