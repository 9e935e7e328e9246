"""Micro timings of the compact-layout movement ops (see exp_compact_route).

Loss-level numbers already measured (T=1500, U=300, V=50, N=16):
current compact loss+grad 117.28 ms vs padded 5.81 ms.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from warp_rnnt_tpu.benchmarks.timing import bench_scalar_chain


def main(N=16, T=1500, U_lab=300, V=50):
    N, T, U_lab, V = map(int, (N, T, U_lab, V))
    U = U_lab + 1
    rng = np.random.RandomState(0)
    xn = rng.randint(T // 2, T + 1, size=N).astype(np.int32)
    yn = rng.randint(U_lab // 2 + 1, U_lab + 1, size=N).astype(np.int32)
    xn[0], yn[0] = T, U_lab
    sizes = xn * (yn + 1)
    STU = int(sizes.sum())
    print(f"N={N} T={T} U={U} V={V} STU={STU}", flush=True)

    key = jax.random.PRNGKey(0)
    packed = jax.jit(lambda k: jax.random.normal(k, (STU, V)) * 0.5)(key)
    packed2 = jnp.asarray(np.asarray(packed[:, :2]))
    xn_j, yn_j = jnp.asarray(xn), jnp.asarray(yn)

    from warp_rnnt_tpu.functional.compact import _row_coordinates

    n_c, t_c, u_c, _, _ = _row_coordinates(STU, xn_j, yn_j)
    n_c, t_c, u_c = map(jnp.asarray, (n_c, t_c, u_c))

    sizes_j = xn_j * (yn_j + 1)
    mem_pref_j = jnp.cumsum(sizes_j) - sizes_j
    t_io = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    u_io = jnp.arange(U, dtype=jnp.int32)[None, None, :]
    pos = mem_pref_j[:, None, None] + t_io * (yn_j[:, None, None] + 1) + u_io
    valid = (t_io < xn_j[:, None, None]) & (u_io <= yn_j[:, None, None])
    pos = jnp.where(valid, pos, 0)

    ms = bench_scalar_chain(lambda p: p[pos], (packed2,), 8)
    print(f"per-cell gather (STU,2)->(N,T,U,2) [{N*T*U/1e6:.1f}M idx]: {ms:8.2f} ms", flush=True)

    pad2 = jnp.zeros((N, T, U, 2), jnp.float32)
    ms = bench_scalar_chain(lambda p: p[n_c, t_c, u_c], (pad2,), 8)
    print(f"per-row inverse (N,T,U,2)->(STU,2) [{STU/1e6:.1f}M idx]: {ms:8.2f} ms", flush=True)

    padV = jnp.zeros((N, T, U, V), jnp.float32)
    ms = bench_scalar_chain(lambda p: p[n_c, t_c, u_c], (padV,), 8)
    print(f"per-row inverse (N,T,U,V)->(STU,V) [{STU/1e6:.1f}M idx]: {ms:8.2f} ms", flush=True)
    del padV

    starts = (mem_pref_j[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
              * (yn_j[:, None] + 1)).reshape(N * T, 1)
    packed_pad = jnp.concatenate([packed, jnp.zeros((U, V), packed.dtype)], 0)

    def slab(p):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,),
        )
        return jax.lax.gather(p, starts, dn, slice_sizes=(U, V), mode="clip")

    out = slab(packed_pad)
    ok = np.allclose(
        np.asarray(out).reshape(N, T, U, V)[np.asarray(valid)],
        np.asarray(packed[pos])[np.asarray(valid)],
    )
    print(f"slab gather parity: {ok}", flush=True)
    ms = bench_scalar_chain(slab, (packed_pad,), 8)
    print(f"frame-slab gather (STU,V)->(N*T,U,V) [{N*T/1e3:.0f}K idx]: {ms:8.2f} ms", flush=True)

    packed2_pad = jnp.concatenate([packed2, jnp.zeros((U, 2), packed.dtype)], 0)

    def slab2(p):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,),
        )
        return jax.lax.gather(p, starts, dn, slice_sizes=(U, 2), mode="clip")

    ms = bench_scalar_chain(slab2, (packed2_pad,), 8)
    print(f"frame-slab gather (STU,2)->(N*T,U,2) [{N*T/1e3:.0f}K idx]: {ms:8.2f} ms", flush=True)

    from warp_rnnt_tpu.functional.compact import compact_gather

    ys_packed = jnp.asarray(
        np.concatenate([rng.randint(1, V, size=y) for y in yn]).astype(np.int32)
    )
    ms = bench_scalar_chain(
        lambda p: compact_gather(p, ys_packed, xn_j, yn_j)[0], (packed,), 8
    )
    print(f"compact_gather fwd (mask over (STU,V)): {ms:8.2f} ms", flush=True)

    v_io = jnp.arange(V, dtype=jnp.int32)[None, :]
    loc = jnp.asarray(rng.randint(0, V, STU).astype(np.int32))

    def dense_write(x):
        ct = x[:, :2]
        return 0.0, ct[:, 0:1] * (v_io == 0) + ct[:, 1:2] * (v_io == loc[:, None])

    from warp_rnnt_tpu.benchmarks.timing import bench_grad_chain

    ms = bench_grad_chain(
        jax.jit(dense_write, donate_argnums=0), jnp.ones((STU, V), jnp.float32), 8
    )
    print(f"dense compare-select write (STU,V): {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
