"""Can the headline forward's label gather use fewer, larger descriptors?

The emit index loc[n, t, u] = labels_ext[n, u] is CONSTANT over t.  Today
we materialize loc as (N, T, U) and take_along_axis with (N, T, U, 1)
indices: N*T*U scalar gather descriptors (latency-bound, ~15 ns each ->
~1.4 ms of the headline forward).  If the indices are left (N, 1, U, 1)
and broadcast inside the gather, XLA could lower to N*U descriptors each
slicing T strided elements.  Measure both (+ the mask formulation) on the
headline config.

RESULT (v5e, 2026-08-17): NEGATIVE.  taa with full (N,T,U) indices 1.404 ms,
taa with broadcast (N,1,U,1) indices 8.853 ms (6.3x SLOWER -- XLA
re-broadcasts the index operand and the gather loses its current efficient
lowering), mask-reduce 2.732 ms.  Current formulation stays.  The whole
headline forward (rnnt_loss, gather=True) measures 1.613 ms, so the gather
is no longer the dominant term anyway.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from warp_rnnt_tpu.benchmarks.timing import bench_scalar_chain

print("backend", jax.default_backend(), flush=True)

N, T, U, V = 32, 150, 21, 5000
key = jax.random.PRNGKey(0)
xs = jax.nn.log_softmax(jax.random.normal(key, (N, T, U, V), jnp.float32), -1)
labels_ext = jax.random.randint(jax.random.PRNGKey(1), (N, U), 1, V, jnp.int32)


def taa_full(xs):
    loc = jnp.broadcast_to(labels_ext[:, None, :], (N, T, U))
    return jnp.take_along_axis(xs, loc[..., None], axis=-1)[..., 0]


def taa_bcast(xs):
    return jnp.take_along_axis(
        xs, labels_ext[:, None, :, None], axis=-1
    )[..., 0]


def mask(xs):
    v_iota = jnp.arange(V, dtype=jnp.int32).reshape(1, 1, 1, V)
    return jnp.sum(
        jnp.where(v_iota == labels_ext[:, None, :, None], xs, 0.0), axis=-1
    )


o_full = jax.jit(taa_full)(xs)
o_b = jax.jit(taa_bcast)(xs)
np.testing.assert_allclose(np.asarray(o_b), np.asarray(o_full), atol=0)
print("parity ok", flush=True)

for name, fn in (("taa (N,T,U) idx", taa_full), ("taa (N,1,U) idx", taa_bcast),
                 ("mask reduce", mask)):
    ms = bench_scalar_chain(fn, (xs,), 30)
    print(f"{name}: {ms:.3f} ms", flush=True)

# and the full forward both ways
from warp_rnnt_tpu import rnnt_loss

ys = labels_ext[:, :-1]
xn = jnp.full((N,), T, jnp.int32)
yn = jnp.full((N,), U - 1, jnp.int32)
ms = bench_scalar_chain(
    lambda z: rnnt_loss(z, ys, xn, yn, reduction="none", gather=True), (xs,),
    30, reduce_out=jnp.sum,
)
print(f"rnnt_loss fwd (current): {ms:.3f} ms", flush=True)
