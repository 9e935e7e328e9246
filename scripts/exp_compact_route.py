"""A/B the compact small-V formulations (round-2 VERDICT item 2).

The packed pipeline at T=1500, U=300, V=50 measures ~5x slower than padded.
This experiment isolates WHERE the time goes (per-index gather taxes vs
iota-select fusions) and measures the candidate fixes:

  * frame-slab unpack: one lax.gather slice per (n, t) frame (N*T indices)
    instead of one gathered row per lattice cell (N*T*U indices);
  * routing the small-V compact loss through the padded internals.

Usage: python scripts/exp_compact_route.py [N T U V]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from warp_rnnt_tpu.benchmarks.timing import bench_grad_chain, bench_scalar_chain


def main(N=16, T=1500, U_lab=300, V=50):
    N, T, U_lab, V = map(int, (N, T, U_lab, V))
    U = U_lab + 1
    rng = np.random.RandomState(0)
    xn = rng.randint(T // 2, T + 1, size=N).astype(np.int32)
    yn = rng.randint(U_lab // 2 + 1, U_lab + 1, size=N).astype(np.int32)
    xn[0], yn[0] = T, U_lab
    sizes = xn * (yn + 1)
    STU = int(sizes.sum())
    print(f"N={N} T={T} U={U} V={V} STU={STU} ({STU*V*4/2**20:.0f} MiB packed,"
          f" {N*T*U*V*4/2**20:.0f} MiB padded)", flush=True)

    key = jax.random.PRNGKey(0)
    packed = jax.jit(lambda k: jax.random.normal(k, (STU, V)) * 0.5 - np.log(V))(key)
    ys_packed = jnp.asarray(
        np.concatenate([rng.randint(1, V, size=y) for y in yn]).astype(np.int32)
    )
    ys_pad = np.zeros((N, U_lab), np.int32)
    off = 0
    ysp = np.asarray(ys_packed)
    for i, y in enumerate(yn):
        ys_pad[i, :y] = ysp[off:off + y]
        off += y
    ys_pad = jnp.asarray(ys_pad)
    xn_j, yn_j = jnp.asarray(xn), jnp.asarray(yn)

    from warp_rnnt_tpu import rnnt_loss
    from warp_rnnt_tpu.functional.compact import _row_coordinates

    # ---- 1. current compact pipeline (loss+grad) --------------------------
    def compact_vg(xs):
        c, g = jax.value_and_grad(
            lambda z: rnnt_loss(z, ys_packed, xn_j, yn_j, compact=True,
                                reduction="mean", max_frames=T,
                                max_labels=U_lab)
        )(xs)
        return c, g

    ms = bench_grad_chain(jax.jit(compact_vg, donate_argnums=0), packed, 8)
    print(f"compact loss+grad (current): {ms:8.2f} ms", flush=True)
    # the donated chain consumed `packed`; regenerate for the micro section
    packed = jax.jit(lambda k: jax.random.normal(k, (STU, V)) * 0.5 - np.log(V))(key)

    # ---- 2. padded pipeline reference -------------------------------------
    padded_xs = jax.jit(
        lambda k: jax.random.normal(k, (N, T, U, V)) * 0.5 - np.log(V)
    )(key)

    def padded_vg(xs):
        return jax.value_and_grad(
            lambda z: rnnt_loss(z, ys_pad, xn_j, yn_j, gather=True,
                                reduction="mean")
        )(xs)

    ms = bench_grad_chain(jax.jit(padded_vg, donate_argnums=0), padded_xs, 8)
    print(f"padded  loss+grad (reference): {ms:8.2f} ms", flush=True)
    del padded_xs

    # ---- 3. micro: the movement ops ---------------------------------------
    n_c, t_c, u_c, mem_pref, cumlen = _row_coordinates(STU, xn_j, yn_j)
    n_c, t_c, u_c = map(jnp.asarray, (n_c, t_c, u_c))
    packed2 = packed[:, :2]

    sizes_j = xn_j * (yn_j + 1)
    mem_pref_j = jnp.cumsum(sizes_j) - sizes_j
    t_io = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    u_io = jnp.arange(U, dtype=jnp.int32)[None, None, :]
    pos = mem_pref_j[:, None, None] + t_io * (yn_j[:, None, None] + 1) + u_io
    valid = (t_io < xn_j[:, None, None]) & (u_io <= yn_j[:, None, None])
    pos = jnp.where(valid, pos, 0)

    # 3a. per-cell row gather packed2 -> padded (N*T*U indices, width 2)
    ms = bench_scalar_chain(lambda p: p[pos], (packed2,), 8)
    print(f"  per-cell gather (STU,2)->(N,T,U,2) [{N*T*U/1e6:.1f}M idx]: {ms:8.2f} ms", flush=True)

    # 3b. per-row inverse padded -> packed (STU indices, width 2)
    pad2 = jnp.zeros((N, T, U, 2), jnp.float32)
    ms = bench_scalar_chain(lambda p: p[n_c, t_c, u_c], (pad2,), 8)
    print(f"  per-row inverse (N,T,U,2)->(STU,2) [{STU/1e6:.1f}M idx]: {ms:8.2f} ms", flush=True)

    # 3c. per-row inverse at width V
    padV = jnp.zeros((N, T, U, V), jnp.float32)
    ms = bench_scalar_chain(lambda p: p[n_c, t_c, u_c], (padV,), 8)
    print(f"  per-row inverse (N,T,U,V)->(STU,V) [{STU/1e6:.1f}M idx]: {ms:8.2f} ms", flush=True)
    del padV

    # 3d. frame-slab gather: (STU,V) -> (N*T, U, V) via slice-per-frame
    starts = (mem_pref_j[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
              * (yn_j[:, None] + 1)).reshape(N * T, 1)
    packed_pad = jnp.concatenate([packed, jnp.zeros((U, V), packed.dtype)], 0)

    def slab(p):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,),
        )
        return jax.lax.gather(
            p, starts, dn, slice_sizes=(U, V), mode="clip",
        )

    out = slab(packed_pad)
    # parity vs per-cell formulation on valid cells
    ok = np.allclose(
        np.asarray(out)[np.asarray(valid.reshape(N * T, U))],
        np.asarray(packed[pos])[np.asarray(valid)].reshape(-1, V),
    )
    print(f"  slab gather parity: {ok}", flush=True)
    ms = bench_scalar_chain(slab, (packed_pad,), 8)
    print(f"  frame-slab gather (STU,V)->(N*T,U,V) [{N*T/1e3:.0f}K idx]: {ms:8.2f} ms", flush=True)

    # 3e. frame-slab at width 2
    packed2_pad = jnp.concatenate([packed2, jnp.zeros((U, 2), packed.dtype)], 0)

    def slab2(p):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,),
        )
        return jax.lax.gather(p, starts, dn, slice_sizes=(U, 2), mode="clip")

    ms = bench_scalar_chain(slab2, (packed2_pad,), 8)
    print(f"  frame-slab gather (STU,2)->(N*T,U,2) [{N*T/1e3:.0f}K idx]: {ms:8.2f} ms", flush=True)

    # 3f. compact_gather (packed mask gather over (STU,V)) fwd
    from warp_rnnt_tpu.functional.compact import compact_gather

    ms = bench_scalar_chain(
        lambda p: compact_gather(p, ys_packed, xn_j, yn_j)[0], (packed,), 8
    )
    print(f"  compact_gather fwd (mask over (STU,V)): {ms:8.2f} ms", flush=True)

    # 3g. dense compare-select write (STU,V) (the gather VJP shape)
    v_io = jnp.arange(V, dtype=jnp.int32)[None, :]
    loc = jnp.asarray(rng.randint(0, V, STU).astype(np.int32))

    def dense_write(ct):
        return ct[:, 0:1] * (v_io == 0) + ct[:, 1:2] * (v_io == loc[:, None])

    ct2 = jnp.ones((STU, 2), jnp.float32)
    step = jax.jit(lambda x: (jnp.float32(0), dense_write(x[:, :2])))
    # grad-chain style: feed (STU,V) back reduced to (STU,2) to keep writes real
    stepw = jax.jit(lambda x: (0.0, dense_write(x[:, :2])), donate_argnums=0)
    ms = bench_grad_chain(stepw, jnp.ones((STU, V), jnp.float32), 8)
    print(f"  dense compare-select write (STU,V): {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
