"""Isolate the packed-movement cost: rnnt_loss(compact) loss+grad on a
pre-packed (STU, V) buffer, Pallas movement kernel vs XLA composition.
The end-to-end bench (bench_joint compact) buries the movement under the
caller's packed-joint construction gathers; this is the library-side cost.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import warp_rnnt_tpu.functional.compact as compact_mod
from warp_rnnt_tpu import rnnt_loss
from warp_rnnt_tpu.benchmarks.timing import bench_scalar_chain

print("backend", jax.default_backend(), flush=True)

for (T, U, V) in [(150, 40, 28), (150, 20, 5000), (1500, 300, 50)]:
    N = 16
    rng = np.random.RandomState(0)
    xn = np.full(N, T, np.int32)
    yn = np.full(N, U, np.int32)
    STU = int((xn * (yn + 1)).sum())
    key = jax.random.PRNGKey(0)
    xs = jax.nn.log_softmax(
        jax.random.normal(key, (STU, V), jnp.float32), -1
    )
    ys = jnp.asarray(rng.randint(1, V, size=int(yn.sum())).astype(np.int32))
    xnj, ynj = jnp.asarray(xn), jnp.asarray(yn)

    # time value+grad via a scalar chain on (cost + 0*grad-sum is elided);
    # instead chain on the gradient buffer itself
    def lg2(force):
        compact_mod._FORCE_KERNEL = force

        def f(z):
            c, g = jax.value_and_grad(
                lambda x: rnnt_loss(
                    x, ys, xnj, ynj, reduction="mean", compact=True,
                    max_frames=T, max_labels=U,
                )
            )(z)
            return c + 1e-30 * g[0, 0]
        try:
            return bench_scalar_chain(f, (xs,), 10)
        finally:
            compact_mod._FORCE_KERNEL = None

    for force, name in ((True, "kernel"), (False, "xla")):
        try:
            ms = lg2(force)
            print(f"T={T} U={U} V={V} loss+grad [{name}]: {ms:.3f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"T={T} U={U} V={V} [{name}] FAILED: {type(e).__name__}",
                  flush=True)
