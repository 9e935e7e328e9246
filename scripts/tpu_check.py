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
# grad path under jit on the chip (scan vs pallas)
g_res = {}
for impl in ("scan", "pallas"):
    g_res[impl] = np.asarray(jax.jit(jax.grad(
        lambda z, impl=impl: rnnt_loss_restricted(
            z, jnp.asarray(ys), xn, yn, jnp.asarray(lf),
            left_context=5, right_context=5, reduction="mean", impl=impl,
        )
    ))(jnp.asarray(x)))
    assert np.isfinite(g_res[impl]).all()
np.testing.assert_allclose(g_res["pallas"], g_res["scan"], rtol=2e-3, atol=1e-4)
print("TPU restricted parity OK (incl. jit grads)", flush=True)

# ---- flat (N, T, U*V) public layout on real hardware -----------------------
N0, T0, U0, V0 = x.shape
c_fl = rnnt_loss(
    jnp.asarray(x).reshape(N0, T0, U0 * V0), jnp.asarray(ys), xn, yn,
    impl="pallas",
)
np.testing.assert_allclose(np.asarray(c_fl), np.asarray(c_s), rtol=2e-5, atol=1e-5)
g_fl = jax.jit(jax.grad(
    lambda z: rnnt_loss(z, jnp.asarray(ys), xn, yn, reduction="sum",
                        impl="pallas")
))(jnp.asarray(x).reshape(N0, T0, U0 * V0))
np.testing.assert_allclose(
    np.asarray(g_fl).reshape(N0, T0, U0, V0), np.asarray(g_s),
    rtol=2e-3, atol=1e-4,
)
print("TPU flat-layout API parity OK", flush=True)

# ---- flat Pallas grad writer (Mosaic) at V >= 128 ---------------------------
# The V=17 case above takes the XLA fallback (flat_write_supported needs
# V >= 128), so this case exists to Mosaic-compile the actual kernel on the
# chip: direct kernel-vs-oracle, then the public 3D rnnt_loss grad with the
# kernel forced on vs forced off.
from warp_rnnt_tpu.functional import gather as _gflat
from warp_rnnt_tpu.ops import flat_kernels as _fk

fV = 640  # BJ = 512 < V: exercises block tiling + boundary straddle paths
rngw = np.random.RandomState(21)
w_ct0 = jnp.asarray(rngw.randn(3, 37, 9).astype(np.float32))
w_ct1 = jnp.asarray(rngw.randn(3, 37, 9).astype(np.float32))
w_loc = rngw.randint(0, fV, (3, 9)).astype(np.int32)
w_loc[:, -1] = 0  # terminal rows: blank/label collision must accumulate
w_got = np.asarray(_fk.flat_grad_write(
    w_ct0, w_ct1, jnp.asarray(w_loc), 0, fV, 9 * fV
))
w_vio = np.arange(fV).reshape(1, 1, 1, fV)
w_l4 = np.broadcast_to(np.asarray(w_loc)[:, None, :, None], (3, 37, 9, 1))
w_want = (
    np.asarray(w_ct0)[..., None] * (w_vio == 0)
    + np.asarray(w_ct1)[..., None] * (w_vio == w_l4)
).reshape(3, 37, 9 * fV)
np.testing.assert_allclose(w_got, w_want, rtol=1e-6, atol=1e-6)

x2 = rngw.randn(3, 37, 9, fV).astype(np.float32)
x2 = x2 - np.log(np.exp(x2).sum(-1, keepdims=True))
ys2 = jnp.asarray(rngw.randint(1, fV, (3, 8)).astype(np.int32))
xn2 = jnp.asarray(np.array([37, 20, 9], np.int32))
yn2 = jnp.asarray(np.array([8, 3, 0], np.int32))
g_flat = {}
for force in (True, False):
    _gflat._FORCE_FLAT_KERNEL = force
    try:
        g_flat[force] = np.asarray(jax.jit(jax.grad(
            lambda z: rnnt_loss(z, ys2, xn2, yn2, reduction="sum",
                                impl="pallas")
        ))(jnp.asarray(x2).reshape(3, 37, 9 * fV)))
    finally:
        _gflat._FORCE_FLAT_KERNEL = None
np.testing.assert_allclose(g_flat[True], g_flat[False], rtol=2e-3, atol=1e-5)
print("TPU flat-writer Mosaic kernel parity OK", flush=True)

# the production composition: log_probs DONATED, so the kernel's
# input_output_alias writes the gradient straight into the donated buffer
# (without the alias XLA copies the full custom-call output — +24.7 ms on
# the 7.5 GB N=128 row).  Parity must hold with donation live.
_gflat._FORCE_FLAT_KERNEL = True
try:
    g_donated = np.asarray(jax.jit(jax.grad(
        lambda z: rnnt_loss(z, ys2, xn2, yn2, reduction="sum",
                            impl="pallas")
    ), donate_argnums=(0,))(jnp.asarray(x2).reshape(3, 37, 9 * fV)))
finally:
    _gflat._FORCE_FLAT_KERNEL = None
np.testing.assert_allclose(g_donated, g_flat[False], rtol=2e-3, atol=1e-5)
print("TPU flat-writer donated-alias parity OK", flush=True)

# ---- fused joint+loss kernel on real hardware ------------------------------
from warp_rnnt_tpu.ops.fused_joint import _labels_ext, fused_joint_core

rngf = np.random.RandomState(11)
fN, fT, fU, fV, fH = 4, 40, 9, 500, 128
fa = jnp.asarray(rngf.randn(fN, fT, fH).astype(np.float32)) * 0.3
fc = jnp.asarray(rngf.randn(fN, fU, fH).astype(np.float32)) * 0.3
fw = jnp.asarray(rngf.randn(fH, fV).astype(np.float32)) * 0.2
fb = jnp.asarray(rngf.randn(fV).astype(np.float32)) * 0.1
fys = jnp.asarray(rngf.randint(1, fV, (fN, fU - 1)).astype(np.int32))
fxn = jnp.asarray(rngf.randint(fU, fT + 1, size=fN).astype(np.int32))
fyn = jnp.asarray(rngf.randint(1, fU, size=fN).astype(np.int32))


def _fj_ref(a, c, w, b):
    h = jnp.tanh(a[:, :, None, :] + c[:, None, :, :])
    z = jax.lax.dot_general(
        h.astype(jnp.bfloat16).reshape(-1, fH), w.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(fN, fT, fU, fV) + b
    lab = _labels_ext(fys, 0, fN)
    lz = jax.nn.logsumexp(z, -1)
    el = jnp.take_along_axis(
        z, jnp.broadcast_to(lab[:, None, :, None], (fN, fT, fU, 1)), -1
    )[..., 0]
    return rnnt_core(
        jnp.stack([z[..., 0] - lz, el - lz], -1), fxn, fyn, 0.0, "pallas"
    ).sum()


_fj_fused = lambda a, c, w, b: fused_joint_core(
    a, c, w, b, fys, fxn, fyn, 0, 0.0, "pallas"
).sum()
lr_, gr_ = jax.jit(jax.value_and_grad(_fj_ref, argnums=(0, 1, 2, 3)))(fa, fc, fw, fb)
lk_, gk_ = jax.jit(jax.value_and_grad(_fj_fused, argnums=(0, 1, 2, 3)))(fa, fc, fw, fb)
np.testing.assert_allclose(float(lk_), float(lr_), rtol=1e-4)
for nm, r_, k_ in zip(("da", "dc", "dw", "db"), gr_, gk_):
    r_, k_ = np.asarray(r_), np.asarray(k_)
    assert np.isfinite(k_).all(), nm
    np.testing.assert_allclose(
        k_, r_, rtol=5e-2, atol=max(2e-2 * np.abs(r_).max(), 1e-5), err_msg=nm
    )
print("TPU fused-joint kernel parity OK", flush=True)

# V-grid-blocked fused kernels (the LLM-scale path), forced at check size
from warp_rnnt_tpu.ops import fused_joint as _fj_mod

_fj_mod._FORCE_BV = 128
try:
    lb_, gb_ = jax.jit(
        jax.value_and_grad(_fj_fused, argnums=(0, 1, 2, 3))
    )(fa, fc, fw, fb)
finally:
    _fj_mod._FORCE_BV = None
np.testing.assert_allclose(float(lb_), float(lk_), rtol=1e-4)
for nm, r_, k_ in zip(("da", "dc", "dw", "db"), gk_, gb_):
    r_, k_ = np.asarray(r_), np.asarray(k_)
    assert np.isfinite(k_).all(), nm
    np.testing.assert_allclose(
        k_, r_, rtol=5e-3, atol=max(1e-3 * np.abs(r_).max(), 1e-6), err_msg=nm
    )
print("TPU fused-joint V-blocked kernel parity OK", flush=True)

# large-U lattice (U > 32): exercises the whole-U tiling (the label axis is
# never grid-blocked — Mosaic requires minor block dims to be 128-multiples
# or the full array dim, see ops/fused_joint.py module docstring)
hN, hT, hU, hV, hH = 2, 64, 48, 300, 128
ha = jnp.asarray(rngf.randn(hN, hT, hH).astype(np.float32)) * 0.3
hc = jnp.asarray(rngf.randn(hN, hU, hH).astype(np.float32)) * 0.3
hw = jnp.asarray(rngf.randn(hH, hV).astype(np.float32)) * 0.2
hb = jnp.asarray(rngf.randn(hV).astype(np.float32)) * 0.1
hys = jnp.asarray(rngf.randint(1, hV, (hN, hU - 1)).astype(np.int32))
hxn = jnp.asarray(np.array([64, 50], np.int32))
hyn = jnp.asarray(np.array([47, 20], np.int32))


def _fj_big_ref(a, c, w, b):
    h = jnp.tanh(a[:, :, None, :] + c[:, None, :, :])
    z = jax.lax.dot_general(
        h.astype(jnp.bfloat16).reshape(-1, hH), w.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(hN, hT, hU, hV) + b
    lab = _labels_ext(hys, 0, hN)
    lz = jax.nn.logsumexp(z, -1)
    el = jnp.take_along_axis(
        z, jnp.broadcast_to(lab[:, None, :, None], (hN, hT, hU, 1)), -1
    )[..., 0]
    return rnnt_core(
        jnp.stack([z[..., 0] - lz, el - lz], -1), hxn, hyn, 0.0, "pallas"
    ).sum()


_fj_big = lambda a, c, w, b: fused_joint_core(
    a, c, w, b, hys, hxn, hyn, 0, 0.0, "pallas"
).sum()
lrB, grB = jax.jit(jax.value_and_grad(_fj_big_ref, argnums=(0, 1, 2, 3)))(ha, hc, hw, hb)
lkB, gkB = jax.jit(jax.value_and_grad(_fj_big, argnums=(0, 1, 2, 3)))(ha, hc, hw, hb)
np.testing.assert_allclose(float(lkB), float(lrB), rtol=1e-4)
for nm, r_, k_ in zip(("da", "dc", "dw", "db"), grB, gkB):
    r_, k_ = np.asarray(r_), np.asarray(k_)
    assert np.isfinite(k_).all(), nm
    np.testing.assert_allclose(
        k_, r_, rtol=5e-2, atol=max(2e-2 * np.abs(r_).max(), 1e-5), err_msg=nm
    )
print("TPU fused-joint large-U parity OK", flush=True)

# production-headline fused scale: H=256, V=5000 (the shape bench_joint
# reports) — parity at reduced N (the reference formulation materializes
# the full logits tensor), then a timing line at the full N=16 so fused
# regressions show up in `make tpu-check`, not in user benchmarks
pN, pT, pU, pV, pH = 2, 64, 21, 5000, 256
pa = jnp.asarray(rngf.randn(pN, pT, pH).astype(np.float32)) * 0.3
pc = jnp.asarray(rngf.randn(pN, pU, pH).astype(np.float32)) * 0.3
pw = jnp.asarray(rngf.randn(pH, pV).astype(np.float32)) * 0.1
pb = jnp.asarray(rngf.randn(pV).astype(np.float32)) * 0.1
pys = jnp.asarray(rngf.randint(1, pV, (pN, pU - 1)).astype(np.int32))
pxn = jnp.asarray(rngf.randint(pU, pT + 1, size=pN).astype(np.int32))
pyn = jnp.asarray(rngf.randint(1, pU, size=pN).astype(np.int32))


def _fj_prod_ref(a, c, w, b):
    h = jnp.tanh(a[:, :, None, :] + c[:, None, :, :])
    z = jax.lax.dot_general(
        h.astype(jnp.bfloat16).reshape(-1, pH), w.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(pN, pT, pU, pV) + b
    lab = _labels_ext(pys, 0, pN)
    lz = jax.nn.logsumexp(z, -1)
    el = jnp.take_along_axis(
        z, jnp.broadcast_to(lab[:, None, :, None], (pN, pT, pU, 1)), -1
    )[..., 0]
    return rnnt_core(
        jnp.stack([z[..., 0] - lz, el - lz], -1), pxn, pyn, 0.0, "pallas"
    ).sum()


_fj_prod = lambda a, c, w, b: fused_joint_core(
    a, c, pw, pb, pys, pxn, pyn, 0, 0.0, "pallas"
).sum()
lrP, grP = jax.jit(jax.value_and_grad(_fj_prod_ref, argnums=(0, 1)))(pa, pc, pw, pb)
lkP, gkP = jax.jit(jax.value_and_grad(_fj_prod, argnums=(0, 1)))(pa, pc, pw, pb)
np.testing.assert_allclose(float(lkP), float(lrP), rtol=1e-4)
for nm, r_, k_ in zip(("da", "dc"), grP, gkP):
    r_, k_ = np.asarray(r_), np.asarray(k_)
    assert np.isfinite(k_).all(), nm
    np.testing.assert_allclose(
        k_, r_, rtol=5e-2, atol=max(2e-2 * np.abs(r_).max(), 1e-5), err_msg=nm
    )
print("TPU fused-joint production-scale (H=256, V=5000) parity OK", flush=True)

# ---- serialized (jax.export) artifact executes the Mosaic kernel -----------
_exp = jax.export.export(
    jax.jit(lambda z: rnnt_core(z, xn, yn, 0.0, "platform")), platforms=("tpu",)
)(jnp.asarray(np.random.RandomState(3).randn(N, T, U, 2).astype(np.float32)))
assert "tpu_custom_call" in _exp.mlir_module()
_exp_in = jnp.asarray(np.random.RandomState(3).randn(N, T, U, 2).astype(np.float32))
np.testing.assert_allclose(
    np.asarray(_exp.call(_exp_in)),
    np.asarray(rnnt_core(_exp_in, xn, yn, 0.0, "scan")),
    rtol=2e-5, atol=1e-5,
)
print("TPU exported-artifact (TF graph-op payload) parity OK", flush=True)

# ---- packed movement kernels (compact layout) on real hardware -------------
from warp_rnnt_tpu.functional.compact import compact_gather, compact_to_padded
from warp_rnnt_tpu.ops.packed_kernels import _loc_rows, packed_lattice

rngk = np.random.RandomState(13)
kxn = np.asarray([40, 33, 17, 29], np.int32)
kyn = np.asarray([11, 7, 0, 11], np.int32)
kV = 33
kSTU = int((kxn * (kyn + 1)).sum())
kxs = jnp.asarray(rngk.randn(kSTU, kV).astype(np.float32))
kys = jnp.asarray(np.concatenate(
    [rngk.randint(1, kV, y) for y in kyn if y > 0]).astype(np.int32))
kxnj, kynj = jnp.asarray(kxn), jnp.asarray(kyn)
kT, kU = int(kxn.max()), int(kyn.max()) + 1
k_want = compact_to_padded(
    compact_gather(kxs, kys, kxnj, kynj, 0)[0], kxnj, kynj, kT, kU
)
k_lr = _loc_rows(kys, kxnj, kynj, kU, 0)
k_got = packed_lattice(kxs, k_lr, kxnj, kynj, 0, kT, kU)
np.testing.assert_allclose(np.asarray(k_got), np.asarray(k_want), atol=1e-5)
k_gk = jax.grad(
    lambda z: (packed_lattice(z, k_lr, kxnj, kynj, 0, kT, kU) ** 2).sum()
)(kxs)
k_gr = jax.grad(
    lambda z: (compact_to_padded(
        compact_gather(z, kys, kxnj, kynj, 0)[0], kxnj, kynj, kT, kU
    ) ** 2).sum()
)(kxs)
np.testing.assert_allclose(np.asarray(k_gk), np.asarray(k_gr), atol=1e-4)
print("TPU packed movement-kernel parity OK", flush=True)

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

# ---- streaming session == one-shot greedy decode on hardware ---------------
# (models/streaming.py exactness contract — chunked stateful encode +
# incremental decode must reproduce greedy_decode bit-for-bit on the chip)
from warp_rnnt_tpu.models import (  # noqa: E402
    greedy_decode, init_model, stream_finish, stream_init, stream_step,
)

_sm, _sp, _sb = init_model(
    jax.random.PRNGKey(0), vocab_size=64, feat_dim=16, N=4, T=48, U=6,
    encoder_hidden=32, predictor_hidden=32, joint_hidden=32,
)
_sfeats = _sb[0]
_sxn = jnp.asarray([48, 37, 20, 9], jnp.int32)
_ref_tok, _ref_len = jax.jit(
    lambda f: greedy_decode(_sm, _sp, f, _sxn, max_length=24)
)(_sfeats)
_st = stream_init(_sm, _sp, 4, max_length=24)
_step = jax.jit(lambda s, c: stream_step(_sm, _sp, s, c, xn=_sxn))
for _i in range(0, 48, 16):
    _st = _step(_st, _sfeats[:, _i:_i + 16])
_tok, _len, _ = stream_finish(_sm, _sp, _st, xn=_sxn)
np.testing.assert_array_equal(np.asarray(_len), np.asarray(_ref_len))
np.testing.assert_array_equal(np.asarray(_tok), np.asarray(_ref_tok))
print("TPU streaming-session exactness OK", flush=True)


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

# fused joint+loss timing at the bench_joint headline shape (N=16, H=256):
# catches fused-kernel performance regressions in the gate itself
fjN, fjH = 16, 256
kf = jax.random.PRNGKey(2)
fa_t = jax.random.normal(kf, (fjN, T, fjH), jnp.float32) * 0.3
fc_t = jax.random.normal(kf, (fjN, U, fjH), jnp.float32) * 0.3
fw_t = jax.random.normal(kf, (fjH, V), jnp.float32) * 0.1
fb_t = jnp.zeros((V,), jnp.float32)
fys_t = jax.random.randint(kf, (fjN, U - 1), 1, V, jnp.int32)
fxn_t = jnp.full((fjN,), T, jnp.int32)
fyn_t = jnp.full((fjN,), U - 1, jnp.int32)
fused_vg = jax.jit(lambda a, c, w, b: jax.value_and_grad(
    lambda aa, cc, ww, bb: fused_joint_core(
        aa, cc, ww, bb, fys_t, fxn_t, fyn_t, 0, 0.0, "pallas"
    ).sum(),
    argnums=(0, 1, 2, 3),
)(a, c, w, b))
ms_fj = timeit(fused_vg, (fa_t, fc_t, fw_t, fb_t), iters=20)
print(f"FUSED joint+loss value+grad (N=16, H=256, V=5000): {ms_fj:.3f} ms",
      flush=True)

# ---- sharded-vs-unsharded timing on the 1-device mesh (SURVEY §7.5) --------
# rnnt_loss_shard_map goes through shard_map + psum on a real Mesh even with
# one chip, so this measures GSPMD partitioning overhead as a number, not an
# assumption, before anyone runs a pod.
mesh1 = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("data",))
sm = jax.jit(lambda x: jax.value_and_grad(
    lambda z: rnnt_loss_shard_map(
        mesh1, z, ys, xn, yn, reduction="mean", gather=True, impl="pallas"
    )
)(x))
un = jax.jit(lambda x: jax.value_and_grad(
    lambda z: rnnt_loss(z, ys, xn, yn, reduction="mean", gather=True,
                        impl="pallas")
)(x))
ms_sm = timeit(sm, (lp,))
ms_un = timeit(un, (lp,))
print(f"sharded loss+grad (shard_map, 1-device mesh): {ms_sm:.3f} ms "
      f"vs unsharded {ms_un:.3f} ms  (overhead {ms_sm - ms_un:+.3f} ms)",
      flush=True)
try:
    import json as _json

    _p = os.path.join(os.path.dirname(__file__), "..",
                      "benchmarks_endtoend.json")
    _e2e = _json.load(open(_p))
    _e2e["sharded_overhead"] = {
        "config": {"N": N, "T": T, "U": U, "V": V, "mesh": "1-device data"},
        "shard_map_ms": round(ms_sm, 3),
        "unsharded_ms": round(ms_un, 3),
        "overhead_ms": round(ms_sm - ms_un, 3),
    }
    _json.dump(_e2e, open(_p, "w"), indent=1)
    print("recorded sharded_overhead in benchmarks_endtoend.json", flush=True)
except FileNotFoundError:
    pass
