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

import jax
import jax.numpy as jnp

from warp_rnnt_tpu.benchmarks.timing import bench_scalar_chain


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


def taa4d(xs4, labels):
    N, T, U, V = xs4.shape
    loc = jnp.broadcast_to(labels[:, None, :], (N, T, U))
    b = xs4[..., 0]
    l = jnp.take_along_axis(xs4, loc[..., None], axis=-1)[..., 0]
    return jnp.stack([b, l], axis=-1)


def main():
    variant, N = sys.argv[1], int(sys.argv[2])
    T, U, V = 150, 21, 5000
    flat = variant in ("taa", "col", "slice")
    xs, labels = make(N, T, U, V, flat)
    fn = {"taa": taa, "col": col, "col4d": col4d, "slice": slice_blank, "taa4d": taa4d}[variant]
    ms = bench_scalar_chain(
        lambda x: fn(x, labels), (xs,), iters=30, reduce_out=jnp.sum
    )
    print(f"{variant} N={N}: {ms:.3f} ms  ({xs.nbytes/(1<<30):.2f} GiB operand)")


if __name__ == "__main__":
    main()
