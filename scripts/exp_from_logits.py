"""Experiment: why does the fused from-logits path lose to log_softmax+gather
(19.5 vs 17.4 ms at N=16, T=150, U=21, V=5000, H=256 — VERDICT round-1
item 2)?

Isolates the from-logits backward and times reformulations:

  cur      current _bwd: d = ct*(iota-select sparse - softmax*gsum)
  scatter  d = ct*(-softmax*gsum) dense write, then two at[].add scatters
  flat     same as cur but on the (N, T, U*V) flat view
  fwd      the _gather2 forward (logsumexp + gathers) alone

Run ONE variant per process:  python scripts/exp_from_logits.py <variant>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from warp_rnnt_tpu.benchmarks.timing import bench_scalar_chain

N, T, U, V = 16, 150, 21, 5000


def make():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    logits = jax.jit(lambda k: jax.random.normal(k, (N, T, U, V), jnp.float32))(k1)
    labels = jax.random.randint(k2, (N, U - 1), 1, V, jnp.int32)
    loc = jnp.concatenate([labels, jnp.zeros((N, 1), jnp.int32)], 1)
    loc = jnp.broadcast_to(loc[:, None, :], (N, T, U))
    logZ = jax.jit(lambda l: jax.nn.logsumexp(l, axis=-1))(logits)
    g_blank = jax.random.normal(k3, (N, T, U), jnp.float32)
    g_emit = jax.random.normal(k4, (N, T, U), jnp.float32)
    ct = jax.random.normal(k5, (N,), jnp.float32)
    return logits, loc, logZ, g_blank, g_emit, ct


def bwd_cur(logits, loc, logZ, g_blank, g_emit, ct):
    v_iota = jnp.arange(V, dtype=jnp.int32).reshape((1,) * loc.ndim + (V,))
    softmax = jnp.exp(logits - logZ[..., None])
    gsum = (g_blank + g_emit)[..., None]
    sparse = g_blank[..., None] * (v_iota == 0) + g_emit[..., None] * (
        v_iota == loc[..., None]
    )
    return ct[:, None, None, None] * (sparse - softmax * gsum)


def bwd_scatter(logits, loc, logZ, g_blank, g_emit, ct):
    softmax = jnp.exp(logits - logZ[..., None])
    gsum = (g_blank + g_emit)[..., None]
    d = ct[:, None, None, None] * (-softmax * gsum)
    ctb = ct[:, None, None]
    n_i = jnp.arange(N)[:, None, None]
    t_i = jnp.arange(T)[None, :, None]
    u_i = jnp.arange(U)[None, None, :]
    d = d.at[n_i, t_i, u_i, jnp.zeros_like(loc)].add(ctb * g_blank)
    d = d.at[n_i, t_i, u_i, loc].add(ctb * g_emit)
    return d


def bwd_flat(logits, loc, logZ, g_blank, g_emit, ct):
    l3 = logits.reshape(N, T, U * V)
    lane_v = jnp.arange(U * V, dtype=jnp.int32).reshape(1, 1, U * V) % V
    z3 = jnp.repeat(logZ, V, axis=-1)
    softmax = jnp.exp(l3 - z3)
    gsum3 = jnp.repeat(g_blank + g_emit, V, axis=-1)
    gb3 = jnp.repeat(g_blank, V, axis=-1)
    ge3 = jnp.repeat(g_emit, V, axis=-1)
    loc3 = jnp.repeat(loc, V, axis=-1)  # per-lane label id of its own row
    sparse = jnp.where(lane_v == 0, gb3, 0.0) + jnp.where(
        lane_v == loc3, ge3, 0.0
    )
    return (ct[:, None, None] * (sparse - softmax * gsum3)).reshape(N, T, U, V)


def fwd_gather2(logits, loc):
    logZ = jax.nn.logsumexp(logits, axis=-1)
    blank_lp = logits[..., 0] - logZ
    emit = jnp.take_along_axis(logits, loc[..., None], axis=-1)[..., 0]
    return blank_lp, emit - logZ


def main():
    variant = sys.argv[1]
    logits, loc, logZ, g_blank, g_emit, ct = make()
    gb = logits.nbytes / (1 << 30)

    if variant == "fwd":
        ms = bench_scalar_chain(
            lambda l: fwd_gather2(l, loc), (logits,), iters=50,
            reduce_out=lambda pair: jnp.sum(pair[0]) + jnp.sum(pair[1]),
        )
    else:
        # the (N,T,U,V) output write IS the work being measured, so a
        # scalar-chain (output summed away) lets XLA skip materializing it;
        # chain the output back as the next input instead (same shape).
        from warp_rnnt_tpu.benchmarks.timing import bench_grad_chain

        fn = {"cur": bwd_cur, "scatter": bwd_scatter, "flat": bwd_flat}[variant]

        def step(l):
            d = fn(l, loc, logZ, g_blank, g_emit, ct)
            return d.ravel()[0:1], d

        ms = bench_grad_chain(jax.jit(step, donate_argnums=0), logits, iters=30)
    print(f"{variant} N={N} ({gb:.2f} GB): {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
