"""Real-TPU validation + timing sweep (run manually; tests use CPU)."""
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
