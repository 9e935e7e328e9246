"""Real-TPU validation + timing sweep (run manually; tests use CPU)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from warp_rnnt_tpu import rnnt_loss, rnnt_loss_with_internals
from warp_rnnt_tpu.functional.core import rnnt_core

print("backend", jax.default_backend(), jax.devices()[0].device_kind, flush=True)

# ---- correctness: pallas vs scan on TPU ----------------------------------
rng = np.random.RandomState(0)
N, T, U, V = 8, 37, 9, 17
x = rng.randn(N, T, U, V).astype(np.float32)
x = x - np.log(np.exp(x).sum(-1, keepdims=True))
ys = rng.randint(1, V, size=(N, U - 1)).astype(np.int32)
xn = rng.randint(U, T + 1, size=(N,)).astype(np.int32)
yn = rng.randint(0, U, size=(N,)).astype(np.int32)

c_s, g_s, a_s, b_s = rnnt_loss_with_internals(jnp.asarray(x), jnp.asarray(ys), xn, yn, impl="scan")
c_p, g_p, a_p, b_p = rnnt_loss_with_internals(jnp.asarray(x), jnp.asarray(ys), xn, yn, impl="pallas")
np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_s), rtol=2e-5, atol=1e-5)
np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_s), rtol=2e-3, atol=1e-4)
print("TPU pallas-vs-scan parity OK", flush=True)

# ---- adversarial shape sweep (tile/block boundaries) on real hardware -----
from warp_rnnt_tpu.functional import scan_impl
from warp_rnnt_tpu.ops import pallas_impl

for (sN, sT, sU) in [(1, 1, 1), (1, 5, 1), (2, 129, 3), (1, 150, 9), (9, 40, 17)]:
    srng = np.random.RandomState(sN * 1000 + sT * 10 + sU)
    sb = np.log(srng.rand(sN, sT, sU).astype(np.float32) + 1e-6)
    se = np.log(srng.rand(sN, sT, sU).astype(np.float32) + 1e-6)
    sxn = srng.randint(1, sT + 1, size=(sN,)).astype(np.int32); sxn[0] = sT
    syn = srng.randint(0, sU, size=(sN,)).astype(np.int32); syn[0] = sU - 1
    a = (jnp.asarray(sb), jnp.asarray(se), jnp.asarray(sxn), jnp.asarray(syn))
    cs, gbs, ges, _, _ = scan_impl.forward_backward(*a)
    cp, gbp, gep, _, _ = pallas_impl.forward_backward(*a)
    np.testing.assert_allclose(np.asarray(cp), np.asarray(cs), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gbp), np.asarray(gbs), rtol=2e-3, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gep), np.asarray(ges), rtol=2e-3, atol=5e-5)
print("TPU shape-sweep parity OK", flush=True)

# ---- pallas under sharding (1-device mesh, real partitioned lowering) ------
from jax.sharding import Mesh
from warp_rnnt_tpu.parallel import rnnt_loss_shard_map, rnnt_loss_sharded

mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("data",))
c_sm = rnnt_loss_shard_map(
    mesh, jnp.asarray(x), jnp.asarray(ys), xn, yn, reduction="none", impl="pallas"
)
np.testing.assert_allclose(np.asarray(c_sm), np.asarray(c_s), rtol=2e-5, atol=1e-5)
g_sh = jax.jit(
    jax.grad(
        lambda z: rnnt_loss_sharded(
            mesh, z, jnp.asarray(ys), xn, yn, reduction="mean", impl="pallas"
        )
    )
)(jnp.asarray(x))
g_ref = jax.grad(
    lambda z: rnnt_loss(z, jnp.asarray(ys), xn, yn, reduction="mean", impl="scan")
)(jnp.asarray(x))
np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref), rtol=2e-3, atol=1e-4)
print("TPU sharded-pallas parity OK", flush=True)

# ---- compact (packed) layout on real hardware ------------------------------
from warp_rnnt_tpu.functional.compact import rnnt_loss_compact_with_internals

rngc = np.random.RandomState(7)
cxn = np.array([5, 8, 3], np.int32)
cyn = np.array([2, 4, 1], np.int32)
R = int(((cxn * (cyn + 1))).sum())
cV = 13
cxs = rngc.randn(R, cV).astype(np.float32)
cxs = cxs - np.log(np.exp(cxs).sum(-1, keepdims=True))
cys = rngc.randint(1, cV, size=int(cyn.sum())).astype(np.int32)
for impl in ("scan", "pallas"):
    cc, cg = rnnt_loss_compact_with_internals(
        jnp.asarray(cxs), jnp.asarray(cys), jnp.asarray(cxn), jnp.asarray(cyn),
        blank=0, impl=impl,
    )[:2]
    if impl == "scan":
        cc_ref, cg_ref = np.asarray(cc), np.asarray(cg)
    else:
        np.testing.assert_allclose(np.asarray(cc), cc_ref, rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cg), cg_ref, rtol=2e-3, atol=1e-4)
print("TPU compact parity OK", flush=True)

# ---- restricted (alignment-band) loss on real hardware ---------------------
from warp_rnnt_tpu.functional.restricted import rnnt_loss_restricted

rngr = np.random.RandomState(9)
lf = np.sort(
    rngr.randint(0, x.shape[1], size=(x.shape[0], x.shape[2] - 1)), axis=1
).astype(np.int32)
for impl in ("scan", "pallas"):
    cr = rnnt_loss_restricted(
        jnp.asarray(x), jnp.asarray(ys), xn, yn, jnp.asarray(lf),
        left_context=5, right_context=5, impl=impl,
    )
    if impl == "scan":
        cr_ref = np.asarray(cr)
    else:
        np.testing.assert_allclose(np.asarray(cr), cr_ref, rtol=2e-4, atol=1e-4)
print("TPU restricted parity OK", flush=True)

# ---- flat3d gather formulation (the >4 GiB path, forced at check size) -----
from warp_rnnt_tpu.functional import gather as _gather_mod

_orig_thresh = _gather_mod._FLAT3D_BYTES
_orig_small = _gather_mod._MASK_ROW_BYTES
_gather_mod._FLAT3D_BYTES = 0
_gather_mod._MASK_ROW_BYTES = 0
try:
    c_f, g_f, _, _ = rnnt_loss_with_internals(
        jnp.asarray(x), jnp.asarray(ys), xn, yn, impl="pallas"
    )
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_s), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_s), rtol=2e-3, atol=1e-4)
finally:
    _gather_mod._FLAT3D_BYTES = _orig_thresh
    _gather_mod._MASK_ROW_BYTES = _orig_small
print("TPU flat3d-gather parity OK", flush=True)


def timeit(fn, args, iters=30, warmup=3):
    # dependency-forced, two-point-calibrated (naive loops measure fantasy
    # numbers here — see warp_rnnt_tpu/benchmarks/timing.py)
    from warp_rnnt_tpu.benchmarks.timing import bench_scalar_chain

    return bench_scalar_chain(fn, args, iters, warmup=warmup)


# ---- headline config -------------------------------------------------------
N, T, U, V = 32, 150, 21, 5000
key = jax.random.PRNGKey(0)
lp = jax.nn.log_softmax(jax.random.normal(key, (N, T, U, V), jnp.float32), -1)
ys = jax.random.randint(key, (N, U - 1), 1, V, jnp.int32)
xn = jnp.full((N,), T, jnp.int32)
yn = jnp.full((N,), U - 1, jnp.int32)
xsg = jax.random.normal(key, (N, T, U, 2), jnp.float32) - 5.0

for impl in ("scan", "pallas"):
    dp = jax.jit(lambda x, impl=impl: jax.value_and_grad(
        lambda z: rnnt_core(z, xn, yn, 0.0, impl).sum())(x))
    ms = timeit(dp, (xsg,))
    print(f"DP-only value+grad gathered [{impl}]: {ms:.3f} ms", flush=True)

    full = jax.jit(lambda x, impl=impl: jax.value_and_grad(
        lambda z: rnnt_loss(z, ys, xn, yn, reduction="mean", gather=True, impl=impl))(x))
    ms = timeit(full, (lp,))
    print(f"FULL loss+grad (N,T,U,V) [{impl}]: {ms:.3f} ms   (ref gather=True: 12.35)", flush=True)

    fwd = jax.jit(lambda x, impl=impl: rnnt_loss(x, ys, xn, yn, reduction="mean", gather=True, impl=impl))
    ms = timeit(fwd, (lp,))
    print(f"FWD-only (beta sweep)   [{impl}]: {ms:.3f} ms", flush=True)
