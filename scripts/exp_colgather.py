"""Experiment: t-invariant column gather vs take_along_axis.

The blank/label gather's indices do not depend on t (labels are per (n, u)),
so instead of gathering N*T*U*2 scalars at ~13-15 ns each (the measured
take_along_axis cost per gathered SCALAR, `functional/gather.py`), the same
result is N*2U full-T column slices: gather with slice_sizes (T, 1), ~150x
fewer index rows.

Run one variant per process:  python scripts/exp_colgather.py <variant> <N>
variants: taa | col | col4d | taa4d
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from warp_rnnt_tpu.benchmarks.timing import bench_scalar_chain
from warp_rnnt_tpu.ops.flat_kernels import _round_up, _VMEM_LIMIT


def make(N, T, U, V, flat):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    shape = (N, T, U * V) if flat else (N, T, U, V)
    xs = jax.jit(lambda k: jax.random.normal(k, shape, jnp.float32))(k1)
    labels = jax.random.randint(k2, (N, U), 1, V, jnp.int32)
    return xs, labels


def taa(xs3, labels):
    """Current production formulation: broadcast (N,T,U) indices."""
    N, T, UV = xs3.shape
    U = labels.shape[1]
    V = UV // U
    off = (jnp.arange(U, dtype=jnp.int32) * V)[None, :]
    lab3 = jnp.broadcast_to((labels + off)[:, None, :], (N, T, U))
    blank3 = jnp.broadcast_to(off[:, None, :], (N, T, U))
    b = jnp.take_along_axis(xs3, blank3, axis=-1)
    l = jnp.take_along_axis(xs3, lab3, axis=-1)
    return jnp.stack([b, l], axis=-1)


def col(xs3, labels):
    """t-invariant column gather: one (T,) slice per (n, 2U) index."""
    N, T, UV = xs3.shape
    U = labels.shape[1]
    V = UV // U
    off = jnp.arange(U, dtype=jnp.int32) * V
    idx = jnp.concatenate([off[None, :].repeat(N, 0), labels + off[None, :]], axis=1)
    out = jax.vmap(lambda m, i: jnp.take(m, i, axis=1))(xs3, idx)  # (N,T,2U)
    return jnp.stack([out[..., :U], out[..., U:]], axis=-1)


def col4d(xs4, labels):
    N, T, U, V = xs4.shape
    blank = jnp.zeros((N, U), jnp.int32)
    idx = jnp.stack([blank, labels], axis=-1)  # (N,U,2)
    # per (n, u): take columns along V with full-T slices
    out = jax.vmap(  # over N
        jax.vmap(  # over U -> operand (T,V), idx (2,)
            lambda m, i: jnp.take(m, i, axis=1), in_axes=(2, 0), out_axes=2
        ),
        in_axes=(0, 0),
    )(jnp.moveaxis(xs4, 2, 2), idx)
    return out  # (N,T,U,2)


def slice_blank(xs3, labels):
    """Blank columns via static stride-V slice (no gather at all) +
    label-only take_along_axis."""
    N, T, UV = xs3.shape
    U = labels.shape[1]
    V = UV // U
    off = (jnp.arange(U, dtype=jnp.int32) * V)[None, :]
    lab3 = jnp.broadcast_to((labels + off)[:, None, :], (N, T, U))
    b = xs3[:, :, 0::V]
    l = jnp.take_along_axis(xs3, lab3, axis=-1)
    return jnp.stack([b, l], axis=-1)


def kernel(xs3, labels):
    """Pallas column-gather: manual double-buffered window DMAs + VPU select.

    NEGATIVE RESULT (v5e, N=128, T=150, U=21, V=5000): 24.8 ms vs 10.5 for
    the two take_along_axis calls — the strided window copies are bound by
    the DMA engine's ~0.24 us per (8,128)-tile chunk (ceil(T/8) chunks per
    window = ~30 ns per T-row vs taa's measured 13 ns per element), and an
    automatic-pipeline formulation (window operands with data-dependent
    BlockSpec index maps) measures identically.  Kept here, out of the
    library, so the measurement is reproducible.
    """
    N, T, UV = xs3.shape
    U = labels.shape[1]
    V = UV // U
    off = jnp.arange(U, dtype=jnp.int32) * V
    cols = jnp.concatenate([off[None, :].repeat(N, 0) + 0,
                            labels + off[None, :]], axis=1)  # (N, 2U)
    out = gather_columns_flat(xs3, cols)  # (N, T, 2U)
    return jnp.stack([out[..., :U], out[..., U:]], axis=-1)


_GATHER_MAX_COLS = 64


def gather_columns_supported(UV: int) -> bool:
    return UV >= 128


def _gather_cols_manual_kernel(bases_ref, xs_ref, onehot_ref, out_ref,
                               scratch, sems, *, K: int, N: int, T: int):
    n = pl.program_id(0)
    slot = jax.lax.rem(n, 2)
    nxt = jax.lax.rem(n + 1, 2)
    # Mosaic DMA slices on the tiled (sublane) T dim need 8-aligned shapes
    # AND offsets: a T % 8 tail is covered by a second 8-row copy at offset
    # Tm reading into the physical tile padding (sliced off after compute).
    Tm = (T // 8) * 8

    def tail_copy(sample, into, k):
        off = pl.multiple_of(jnp.int32(Tm), 8)
        return pltpu.make_async_copy(
            xs_ref.at[sample, pl.ds(off, 8),
                      pl.ds(pl.multiple_of(bases_ref[sample, k], 128), 128)],
            scratch.at[into, pl.ds(Tm, 8), k, :],
            sems.at[into, K + k],
        )

    def issue(sample, into):
        # all K window copies go in flight together; the scalar core only
        # pays the issue cost, transfers overlap each other and the body
        for k in range(K):
            b = pl.multiple_of(bases_ref[sample, k], 128)
            if Tm > 0:
                pltpu.make_async_copy(
                    xs_ref.at[sample, pl.ds(0, Tm), pl.ds(b, 128)],
                    scratch.at[into, pl.ds(0, Tm), k, :],
                    sems.at[into, k],
                ).start()
            if Tm != T:
                tail_copy(sample, into, k).start()

    @pl.when(n == 0)
    def _():
        issue(0, 0)

    @pl.when(n + 1 < N)
    def _():
        issue(n + 1, nxt)

    for k in range(K):
        if Tm > 0:
            pltpu.make_async_copy(
                xs_ref.at[n, pl.ds(0, Tm), pl.ds(0, 128)],  # shape stand-in
                scratch.at[slot, pl.ds(0, Tm), k, :],
                sems.at[slot, k],
            ).wait()
        if Tm != T:
            tail_copy(n, slot, k).wait()
    w = scratch[slot].astype(jnp.float32)                      # (Tp, K, 128)
    picked = jnp.sum(w * onehot_ref[0], axis=2)                # (Tp, K)
    out_ref[0] = picked[:T].astype(out_ref.dtype)


def gather_columns_flat(xs3, cols, interpret: bool | None = None):
    """xs3 (N, T, UV), cols (N, K) int32 -> (N, T, K): out[n,t,k] = xs3[n,t,cols[n,k]].

    Grid is (N,); while sample n reduces its K windows to their target lanes
    (one-hot multiply on the VPU), the K aligned (T, 128) window copies for
    sample n+1 are already in flight.  Window bases are clamped to UV-128 so
    the trailing window never reads past the buffer (the lane one-hot is
    built from the clamped offset).  K > _GATHER_MAX_COLS chunks into
    several calls concatenated by XLA.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, T, UV = xs3.shape
    K = cols.shape[1]
    cols = cols.astype(jnp.int32)
    if K > _GATHER_MAX_COLS:
        outs = [
            gather_columns_flat(xs3, cols[:, k0:k0 + _GATHER_MAX_COLS],
                                interpret=interpret)
            for k0 in range(0, K, _GATHER_MAX_COLS)
        ]
        return jnp.concatenate(outs, axis=-1)

    # trailing partial 128-tile: the window reads physical lane padding;
    # the selected lane (cols - bases < 128) is always real data
    bases = (cols // 128) * 128
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (N, K, 128), 2)
        == (cols - bases)[..., None]
    ).astype(jnp.float32)
    Tp = _round_up(T, 8)
    if interpret and Tp != T:
        # on hardware the 8-row tail copy reads physical sublane padding;
        # interpret mode CLAMPS out-of-bounds starts instead (corrupting the
        # tail rows), so give it real padding
        xs3 = jnp.pad(xs3, ((0, 0), (0, Tp - T), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xs3 stays in HBM
            pl.BlockSpec((1, K, 128), lambda n, *_: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, K), lambda n, *_: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, Tp, K, 128), xs3.dtype),
            pltpu.SemaphoreType.DMA((2, 2 * K)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_gather_cols_manual_kernel, K=K, N=N, T=T),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, T, K), xs3.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(bases, xs3, onehot)

def taa4d(xs4, labels):
    N, T, U, V = xs4.shape
    loc = jnp.broadcast_to(labels[:, None, :], (N, T, U))
    b = xs4[..., 0]
    l = jnp.take_along_axis(xs4, loc[..., None], axis=-1)[..., 0]
    return jnp.stack([b, l], axis=-1)


def main():
    variant, N = sys.argv[1], int(sys.argv[2])
    T, U, V = 150, 21, 5000
    flat = variant in ("taa", "col", "slice", "kernel")
    xs, labels = make(N, T, U, V, flat)
    fn = {"taa": taa, "col": col, "col4d": col4d, "slice": slice_blank, "taa4d": taa4d, "kernel": kernel}[variant]
    ms = bench_scalar_chain(
        lambda x: fn(x, labels), (xs,), iters=30, reduce_out=jnp.sum
    )
    print(f"{variant} N={N}: {ms:.3f} ms  ({xs.nbytes/(1<<30):.2f} GiB operand)")


if __name__ == "__main__":
    main()
