"""Experiment: isolate the >4 GB gather cliff (VERDICT round-1 item 1).

Measures, on real TPU, the forward blank/label gather and its dense VJP at
N in {64, 128} for T=150, U=21, V=5000 (3.8 / 7.7 GB operands) under several
formulations:

  taa       take_along_axis (current large-V path)
  halves    two static-slice take_along_axis halves (<4 GB each)
  lmap      lax.map over 2 row-chunks
  pallas    streaming Pallas kernel (full read, scalar-prefetch labels)

Run ONE config per process (remote-tunnel hygiene):
  python scripts/exp_gather.py <variant> <N> [bwd]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from warp_rnnt_tpu.benchmarks.timing import bench_scalar_chain


def make(N, T, U, V):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    xs = jax.jit(lambda k: jax.random.normal(k, (N, T, U, V), jnp.float32))(k1)
    labels = jax.random.randint(k2, (N, U - 1), 1, V, jnp.int32)
    labels_ext = jnp.concatenate(
        [labels, jnp.zeros((N, 1), jnp.int32)], axis=1
    )
    return xs, labels_ext


def fwd_taa(xs, labels_ext):
    N, T, U, V = xs.shape
    loc = jnp.broadcast_to(labels_ext[:, None, :], (N, T, U))
    blank_col = xs[..., 0]
    lab_col = jnp.take_along_axis(xs, loc[..., None], axis=-1)[..., 0]
    return blank_col, lab_col


def fwd_halves(xs, labels_ext):
    N, T, U, V = xs.shape
    loc = jnp.broadcast_to(labels_ext[:, None, :], (N, T, U))
    blank_col = xs[..., 0]
    h = N // 2
    lab0 = jnp.take_along_axis(xs[:h], loc[:h, ..., None], axis=-1)[..., 0]
    lab1 = jnp.take_along_axis(xs[h:], loc[h:, ..., None], axis=-1)[..., 0]
    return blank_col, jnp.concatenate([lab0, lab1], axis=0)


def fwd_lmap(xs, labels_ext):
    N, T, U, V = xs.shape
    loc = jnp.broadcast_to(labels_ext[:, None, :], (N, T, U))
    blank_col = xs[..., 0]
    C = 2
    xs_c = xs.reshape(C, N // C, T, U, V)
    loc_c = loc.reshape(C, N // C, T, U)
    lab = jax.lax.map(
        lambda t: jnp.take_along_axis(t[0], t[1][..., None], axis=-1)[..., 0],
        (xs_c, loc_c),
    )
    return blank_col, lab.reshape(N, T, U)


def fwd_pallas(xs, labels_ext):
    from exp_pallas_gather import gather_fwd_pallas

    return gather_fwd_pallas(xs, labels_ext, 0)


def fwd_taa3d_from4d(xs, labels_ext):
    """Reshape the 4D tensor to (N, T, U*V) inside the graph, flat gather."""
    N, T, U, V = xs.shape
    xs3 = xs.reshape(N, T, U * V)
    flat = labels_ext + jnp.arange(U, dtype=jnp.int32)[None, :] * V  # (N, U)
    loc3 = jnp.broadcast_to(flat[:, None, :], (N, T, U))
    blank3 = jnp.broadcast_to(
        (jnp.arange(U, dtype=jnp.int32) * V)[None, None, :], (N, T, U)
    )
    lab_col = jnp.take_along_axis(xs3, loc3, axis=-1)
    blank_col = jnp.take_along_axis(xs3, blank3, axis=-1)
    return blank_col, lab_col


def bwd_dense(ct2, labels_ext, shape):
    """Current dense compare-select VJP (iota == loc writes)."""
    N, T, U, V = shape
    loc = jnp.broadcast_to(labels_ext[:, None, :], (N, T, U))
    v_iota = jnp.arange(V, dtype=jnp.int32).reshape(1, 1, 1, V)
    return ct2[..., 0:1] * (v_iota == 0) + ct2[..., 1:2] * (
        v_iota == loc[..., None]
    )


def bwd_pallas(ct2, labels_ext, shape):
    from exp_pallas_gather import scatter_bwd_pallas

    return scatter_bwd_pallas(ct2[..., 0], ct2[..., 1], labels_ext, 0, shape[-1])


def main():
    variant, N = sys.argv[1], int(sys.argv[2])
    do_bwd = len(sys.argv) > 3 and sys.argv[3] == "bwd"
    T, U, V = 150, 21, 5000
    xs, labels_ext = make(N, T, U, V)
    gb = xs.nbytes / (1 << 30)

    if do_bwd:
        key = jax.random.PRNGKey(1)
        ct2 = jax.random.normal(key, (N, T, U, 2), jnp.float32)
        fn = {"dense": bwd_dense, "pallas": bwd_pallas}[variant]
        ms = bench_scalar_chain(
            lambda c: fn(c, labels_ext, (N, T, U, V)),
            (ct2,), iters=30, reduce_out=jnp.sum,
        )
        print(f"BWD {variant} N={N} ({gb:.1f} GB out): {ms:.2f} ms", flush=True)
        return

    if variant == "sparse":
        # sparse-window pallas kernel on a natively-3D operand
        from exp_pallas_gather import gather_fwd_sparse

        key = jax.random.PRNGKey(0)
        xs3 = jax.jit(
            lambda k: jax.random.normal(k, (N, T, U * V), jnp.float32)
        )(key)
        ms = bench_scalar_chain(
            lambda x: gather_fwd_sparse(x, labels_ext, 0, V),
            (xs3,), iters=30,
            reduce_out=lambda pair: jnp.sum(pair[0]) + jnp.sum(pair[1]),
        )
        print(f"FWD sparse N={N} ({gb:.1f} GB in): {ms:.2f} ms", flush=True)
        return

    if variant == "sparse4d":
        # sparse-window pallas on the reshaped view of a 4D operand
        from exp_pallas_gather import gather_fwd_sparse

        ms = bench_scalar_chain(
            lambda x: gather_fwd_sparse(
                x.reshape(N, T, U * V), labels_ext, 0, V
            ),
            (xs,), iters=30,
            reduce_out=lambda pair: jnp.sum(pair[0]) + jnp.sum(pair[1]),
        )
        print(f"FWD sparse4d N={N} ({gb:.1f} GB in): {ms:.2f} ms", flush=True)
        return

    if variant == "taa3d_fresh":
        # generate the operand 3D from scratch: isolates layout effects from
        # total-size effects
        key = jax.random.PRNGKey(0)
        xs3 = jax.jit(
            lambda k: jax.random.normal(k, (N, T, U * V), jnp.float32)
        )(key)
        flat = labels_ext + jnp.arange(U, dtype=jnp.int32)[None, :] * V
        loc3 = jnp.broadcast_to(flat[:, None, :], (N, T, U))
        ms = bench_scalar_chain(
            lambda x: jnp.take_along_axis(x, loc3, axis=-1),
            (xs3,), iters=30, reduce_out=jnp.sum,
        )
        print(f"FWD taa3d_fresh N={N} ({gb:.1f} GB in): {ms:.2f} ms", flush=True)
        return

    fn = {"taa": fwd_taa, "halves": fwd_halves, "lmap": fwd_lmap,
          "pallas": fwd_pallas, "taa3d4": fwd_taa3d_from4d}[variant]
    ms = bench_scalar_chain(
        lambda x: fn(x, labels_ext),
        (xs,), iters=30,
        reduce_out=lambda pair: jnp.sum(pair[0]) + jnp.sum(pair[1]),
    )
    print(f"FWD {variant} N={N} ({gb:.1f} GB in): {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
