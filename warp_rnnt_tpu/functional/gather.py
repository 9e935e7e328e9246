"""Blank/label gather with a dense (scatter-free) VJP.

The padded and compact paths both reduce the vocabulary axis early: from each
row of ``(R, V)`` log-probs only the blank entry and one label entry survive
(`pytorch_binding/warp_rnnt/__init__.py:118-128`, `core_compact.cu:403-436`).
Differentiating a plain ``take_along_axis`` makes XLA emit a scatter-add into
the (R, V) cotangent, which is catastrophically slow on TPU.  Since every row
receives at most two nonzeros at *known* columns, the VJP is instead a dense
compare-select write:

    d_xs[r, v] = ct[r, 0] * [v == blank] + ct[r, 1] * [v == loc[r]]

When ``loc[r] == blank`` (terminal lattice rows) both terms accumulate,
matching the scatter-add semantics of the reference autograd gather.

Forward formulation is chosen by vocabulary size (measured on v5e):
  * large V (> ~12 KiB/row): last-axis take_along_axis — its cost is a flat
    ~15 ns per gathered row, independent of V (sparse reads);
  * small/mid V: a compare-mask reduction over V, which runs at HBM
    bandwidth and therefore wins while rows are under ~12 KiB (V <= 3072
    fp32), measured crossover in `scripts/exp_midv.py`.

Implementation note: these stay XLA expressions on purpose.  A Pallas
formulation requires (R, 1)/(R, 2)-shaped operands whose forced row-major
layouts tile-pad the minor dimension to 128 lanes (up to 64-128x HBM
expansion) and insert relayout copies at every kernel boundary — measured
strictly slower at all V.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Forward-gather formulation crossover (measured on v5e, scripts/exp_midv.py):
# take_along_axis costs a flat ~15 ns per gathered row REGARDLESS of V
# (8.1 ms at N*T*U=524K rows whether V=512 or 4096), while the compare-mask
# reduction reads the whole row at HBM bandwidth (~V*itemsize/819GB/s per
# row).  Mask wins while V*itemsize is under ~12 KiB — i.e. V<=3072 fp32 /
# V<=6144 bf16 — which covers the entire common ASR vocab range the old
# V<=256 threshold missed (taa at V=1024 was costing 8.7 ms of a 54 ms
# train step for a 2 MB gather).
_MASK_ROW_BYTES = 12 << 10


def _use_mask(V, dtype):
    return V * jnp.dtype(dtype).itemsize <= _MASK_ROW_BYTES
# take_along_axis on the 4D (N, T, U, V) operand leaves XLA's fast indexing
# path once the operand exceeds ~4 GiB (measured: 3.0 ms at 4.0 GB ->
# 10.1 ms at 6.0 GB -> 23.7 ms at 7.5 GB; presumably the 32-bit byte-offset
# limit on the tile-padded (U, V) minor dims).  Above the limit the gather
# is reformulated on the flattened (N, T, U*V) view with fused u*V + loc
# indices — measured 10.6 ms vs 23.7 ms on the 7.5 GB N=128, V=5000 operand.
# Measured unit costs (scripts/exp_colgather.py, v5e): flat take_along_axis
# is ~13 ns per gathered SCALAR regardless of V; the 4D slow path is ~26 ns.
# The label gather is ~all of the flat formulation's cost; the blank column
# adds a second full-price gather on the flat view (a stride-V slice
# measured 3x WORSE at 30 ms — XLA strided slices over tiled minor dims are
# pathological — and a Pallas window-DMA column gather measured 24.8 ms,
# bound by the DMA engine's ~0.24 us per (8,128)-tile chunk).  Batch
# chunking and Pallas streaming/sparse-window kernels were likewise tried
# and rejected (chunk slices force retiled padded copies; operand relayouts
# RESOURCE_EXHAUST the chip at 7.5 GB).  Net: ~10.5 ms is the practical
# floor for this gather on v5e in either layout.
_FLAT3D_BYTES = 1 << 32


def _flat3d_indices(loc, blank, V):
    """(N, T, U) label indices -> flattened (u*V + idx) blank/label indices."""
    N, T, U = loc.shape
    off = (jnp.arange(U, dtype=jnp.int32) * V)[None, None, :]
    lab3 = loc.astype(jnp.int32) + off
    blank3 = jnp.broadcast_to(off + blank, (N, T, U))
    return blank3, lab3


def _gather_4d_flat3d(xs, loc, blank):
    N, T, U, V = xs.shape
    xs3 = xs.reshape(N, T, U * V)
    blank3, lab3 = _flat3d_indices(loc, blank, V)
    blank_col = jnp.take_along_axis(xs3, blank3, axis=-1)
    label_col = jnp.take_along_axis(xs3, lab3, axis=-1)
    return jnp.stack([blank_col, label_col], axis=-1)


def _use_flat3d(xs, loc):
    if not (
        xs.ndim == 4
        and loc.ndim == 3
        and not _use_mask(xs.shape[-1], xs.dtype)
    ):
        return False
    size = xs.size
    if not isinstance(size, int):
        # symbolic dims (jax.export / jax2tf shape polymorphism): the byte
        # comparison is undecidable — keep the default formulation
        return False
    return size * xs.dtype.itemsize > _FLAT3D_BYTES


def flat_arg_formats(device=None, sharding=None):
    """Row-major layout pins for the flat (N, T, (U+1)*V) loss arguments.

    Returns ``(arg_format, grad_format)`` — two identical row-major
    `jax.experimental.layout.Format`s — for pinning the flat log-prob
    parameter and its gradient output at a jit boundary:

        arg_fmt, grad_fmt = warp_rnnt_tpu.flat_arg_formats()
        step = jax.jit(loss_vg, donate_argnums=0,
                       in_shardings=arg_fmt, out_shardings=(None, grad_fmt))

    Why this exists: when the flat tensor is a jit PARAMETER that feeds only
    gathers, XLA picks a {0,2,1} parameter layout, while the Mosaic flat
    grad writer (`ops/flat_kernels.flat_grad_write`) constrains row-major
    operands/results — XLA reconciles with full-tensor transpose copies
    (measured 47-72 ms loss+grad vs 23.1 pinned at the N=128, V=5000 cliff;
    `scripts/exp_flat_alias.py`).  Producers inside the same jit
    (matmul/log_softmax) are row-major already and don't need this; the pin
    makes an isolated loss jit safe by default, mirroring the reference's
    contract that the large-V path needs no user-side layout care
    (`core_gather.cu:359-388`).

    ``sharding`` (or ``device``) selects placement; defaults to the first
    local device.
    """
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    if sharding is None:
        sharding = SingleDeviceSharding(device or jax.devices()[0])
    fmt = Format(Layout((0, 1, 2)), sharding)  # major-to-minor: row-major
    return fmt, fmt


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_blank_label(xs, loc, blank: int):
    """xs (..., V), loc (...,) int32 -> (..., 2): [blank entry, loc entry]."""
    V = xs.shape[-1]
    if _use_flat3d(xs, loc):
        return _gather_4d_flat3d(xs, loc, blank)
    blank_col = xs[..., blank]
    if _use_mask(V, xs.dtype):
        v_iota = jnp.arange(V, dtype=jnp.int32).reshape((1,) * loc.ndim + (V,))
        label_col = jnp.sum(
            jnp.where(v_iota == loc[..., None], xs, 0.0), axis=-1
        )
    else:
        label_col = jnp.take_along_axis(
            xs, loc[..., None].astype(jnp.int32), axis=-1
        )[..., 0]
    return jnp.stack([blank_col, label_col], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_blank_label_flat(xs3, loc, blank: int, V: int):
    """Flat-layout gather: xs3 (N, T, U*V), loc (N, T, U) -> (N, T, U, 2).

    The flat (N, T, U*V) layout serves callers whose producer emits the
    lattice flat (the public `rnnt_loss` accepts 3D log_probs and routes
    here).  Measured end-to-end at the >4 GiB cliff (N=128, T=150, V=5000,
    loss+grad, donated): flat 23.3 ms vs 4D 22.6 — both at the same
    gather+write floor (see `_FLAT3D_BYTES` notes), so neither layout needs
    a relayout to reach the other's speed.

    TPU layout contract: under jit, pin row-major layouts on the flat
    log_probs parameter and the gradient output
    (``jax.experimental.layout.Format(Layout((0, 1, 2)), sharding)``) when
    the parameter feeds this loss directly — at an isolated jit boundary
    XLA otherwise picks a {0,2,1} layout for the gather and reconciles with
    full-tensor transpose copies against the row-major Mosaic grad writer
    (measured 47-72 ms; `scripts/exp_flat_alias.py`).  Producers inside the
    same jit (matmul/log_softmax) are row-major already.

    The VJP is the same dense compare-select write as `gather_blank_label`,
    emitted directly in flat coordinates by a Pallas kernel on TPU
    (`ops/flat_kernels.flat_grad_write`), aliased in place into the
    (donated) log_probs buffer — expressing it over the logical 4D view and
    reshaping forces a relayout copy of the full operand (measured +46 ms
    on the 7.5 GB N=128, V=5000 row).

    Contract: ``loc`` must be frame-invariant (loc[:, t] identical for all
    t — the production index construction broadcasts per-sample labels over
    t); the flat VJP exploits this and keeps only loc[:, 0] as residual.
    """
    blank3, lab3 = _flat3d_indices(loc, blank, V)
    blank_col = jnp.take_along_axis(xs3, blank3, axis=-1)
    label_col = jnp.take_along_axis(xs3, lab3, axis=-1)
    return jnp.stack([blank_col, label_col], axis=-1)


# Flat-VJP backend: None = auto (Pallas flat writer on TPU), tests force it.
_FORCE_FLAT_KERNEL = None

# Alias the flat writer's output into the log_probs buffer (see
# flat_kernels.flat_grad_write).  Module-level so experiments can A/B it.
_FLAT_ALIAS = True


def _gather_flat_fwd(xs3, loc, blank, V):
    dtype_tag = jnp.zeros((0,), xs3.dtype)
    T = loc.shape[1]
    # loc is frame-invariant by contract (see gather_blank_label_flat).
    # xs3 itself rides along as a residual purely as an ALIAS TARGET for the
    # Pallas grad writer (never read there); on the fallback path it is dead
    # and DCE'd out of the saved residuals.
    return gather_blank_label_flat(xs3, loc, blank, V), (loc[:, 0, :], T,
                                                         dtype_tag, xs3)


def _gather_flat_bwd(blank, V, res, ct):
    from warp_rnnt_tpu.ops import flat_kernels

    loc_rows, T, dtype_tag, xs3 = res
    N, U = loc_rows.shape
    use_kernel = _FORCE_FLAT_KERNEL
    if use_kernel is None:
        use_kernel = (
            jax.default_backend() == "tpu"
            and flat_kernels.flat_write_supported(V)
        )
    if use_kernel:
        d3 = flat_kernels.flat_grad_write(
            ct[..., 0], ct[..., 1], loc_rows, blank, V, U * V,
            out_dtype=dtype_tag.dtype,
            # in-place into the (donated) log_probs buffer: a custom-call
            # output cannot otherwise satisfy jit donation and XLA copies
            # the full 7.5 GB result (see flat_kernels.flat_grad_write)
            out_alias=xs3 if _FLAT_ALIAS else None,
        )
        return d3, None
    v_iota = jnp.arange(V, dtype=jnp.int32).reshape(1, 1, 1, V)
    ct = ct.astype(jnp.float32)
    loc = jnp.broadcast_to(loc_rows[:, None, :], (N, T, U))
    d4 = ct[..., 0:1] * (v_iota == blank) + ct[..., 1:2] * (
        v_iota == loc[..., None]
    )
    return d4.reshape(N, T, U * V).astype(dtype_tag.dtype), None


gather_blank_label_flat.defvjp(_gather_flat_fwd, _gather_flat_bwd)


def _gather_fwd(xs, loc, blank):
    dtype_tag = jnp.zeros((0,), xs.dtype)  # carries static dtype through residuals
    return gather_blank_label(xs, loc, blank), (loc, xs.shape[-1], dtype_tag)


def _gather_bwd(blank, res, ct):
    loc, V, dtype_tag = res
    v_iota = jnp.arange(V, dtype=jnp.int32).reshape((1,) * loc.ndim + (V,))
    ct = ct.astype(jnp.float32)
    d_xs = ct[..., 0:1] * (v_iota == blank) + ct[..., 1:2] * (
        v_iota == loc[..., None]
    )
    return d_xs.astype(dtype_tag.dtype), None


gather_blank_label.defvjp(_gather_fwd, _gather_bwd)
