"""ctypes bindings for the native (C++) CPU runtime.

Compiles `csrc/rnnt_cpu.cpp` on first use with the system g++ (cached next
to the package) and exposes:

  * `transduce_batch_native(...)` — fast exact forward-backward, same
    contract as `numpy_oracle.transduce_batch` (the NumPy oracle remains the
    normative slow path; this one fuzzes configurations 100-1000x larger).
  * `compact_offsets / pack_compact / pack_labels / scatter_compact_grads` —
    host-side packing utilities for the compact layout (reference
    `binding.cpp:141-158`, `core_compact.cu:456-484`).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import tempfile
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None

_SRC = pathlib.Path(__file__).resolve().parents[2] / "csrc" / "rnnt_cpu.cpp"


class NativeUnavailable(RuntimeError):
    pass


def _build() -> pathlib.Path:
    cache_dir = pathlib.Path(
        os.environ.get(
            "WARP_RNNT_TPU_CACHE",
            pathlib.Path(tempfile.gettempdir()) / "warp_rnnt_tpu_native",
        )
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    so = cache_dir / "librnnt_cpu.so"
    if so.exists() and so.stat().st_mtime >= _SRC.stat().st_mtime:
        return so
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(so),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        raise NativeUnavailable(f"failed to build native runtime: {detail}") from e
    return so


def _lib():
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(str(_build()))
            c_f32p = ctypes.POINTER(ctypes.c_float)
            c_i32p = ctypes.POINTER(ctypes.c_int)
            c_i64p = ctypes.POINTER(ctypes.c_int64)
            lib.rnnt_batch_fb_f32.restype = ctypes.c_int
            lib.rnnt_batch_fb_f32.argtypes = [
                c_f32p, c_i32p, c_i32p, c_i32p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_float, c_f32p, c_f32p, c_f32p, c_f32p,
            ]
            lib.rnnt_compact_offsets.restype = None
            lib.rnnt_compact_offsets.argtypes = [
                c_i32p, c_i32p, ctypes.c_int, c_i64p, c_i64p, c_i64p, c_i64p,
            ]
            lib.rnnt_pack_compact_f32.restype = ctypes.c_int64
            lib.rnnt_pack_compact_f32.argtypes = [
                c_f32p, c_i32p, c_i32p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, c_f32p,
            ]
            lib.rnnt_pack_labels_i32.restype = ctypes.c_int64
            lib.rnnt_pack_labels_i32.argtypes = [
                c_i32p, c_i32p, ctypes.c_int, ctypes.c_int, c_i32p,
            ]
            lib.rnnt_scatter_compact_grads_f32.restype = ctypes.c_int
            lib.rnnt_scatter_compact_grads_f32.argtypes = [
                c_f32p, c_i32p, c_f32p, c_i64p,
                ctypes.c_int, ctypes.c_int64, ctypes.c_int, ctypes.c_int, c_f32p,
            ]
            _LIB = lib
    return _LIB


def _f32(a):
    return np.ascontiguousarray(a, dtype=np.float32)


def _i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def transduce_batch_native(log_probs, labels, xn, yn, blank=0, fastemit_lambda=0.0):
    """Native equivalent of `numpy_oracle.transduce_batch` (fp32)."""
    xs = _f32(log_probs)
    ys = _i32(labels)
    xn = _i32(xn)
    yn = _i32(yn)
    N, T, U, V = xs.shape
    costs = np.zeros((N,), np.float32)
    grads = np.zeros((N, T, U, V), np.float32)
    alphas = np.full((N, T, U), -np.inf, np.float32)
    betas = np.full((N, T, U), -np.inf, np.float32)
    st = _lib().rnnt_batch_fb_f32(
        _ptr(xs, ctypes.c_float), _ptr(ys, ctypes.c_int),
        _ptr(xn, ctypes.c_int), _ptr(yn, ctypes.c_int),
        N, T, U, V, blank, ctypes.c_float(fastemit_lambda),
        _ptr(costs, ctypes.c_float), _ptr(grads, ctypes.c_float),
        _ptr(alphas, ctypes.c_float), _ptr(betas, ctypes.c_float),
    )
    if st != 0:
        raise ValueError(f"native rnnt_batch_fb_f32 failed with status {st}")
    return costs, alphas, betas, grads


def compact_offsets(xn, yn):
    xn = _i32(xn)
    yn = _i32(yn)
    N = xn.shape[0]
    mem_pref = np.zeros((N,), np.int64)
    label_pref = np.zeros((N,), np.int64)
    stu = np.zeros((1,), np.int64)
    su = np.zeros((1,), np.int64)
    _lib().rnnt_compact_offsets(
        _ptr(xn, ctypes.c_int), _ptr(yn, ctypes.c_int), N,
        _ptr(mem_pref, ctypes.c_int64), _ptr(label_pref, ctypes.c_int64),
        _ptr(stu, ctypes.c_int64), _ptr(su, ctypes.c_int64),
    )
    return mem_pref, label_pref, int(stu[0]), int(su[0])


def pack_compact(xs_padded, xn, yn):
    """Padded (N, T, U, V) -> compact (STU, V) and (sum(yn),) labels omitted."""
    xs = _f32(xs_padded)
    xn = _i32(xn)
    yn = _i32(yn)
    N, T, U, V = xs.shape
    _, _, stu, _ = compact_offsets(xn, yn)
    out = np.empty((stu, V), np.float32)
    written = _lib().rnnt_pack_compact_f32(
        _ptr(xs, ctypes.c_float), _ptr(xn, ctypes.c_int), _ptr(yn, ctypes.c_int),
        N, T, U, V, _ptr(out, ctypes.c_float),
    )
    assert written == stu, (written, stu)
    return out


def pack_labels(ys_padded, yn):
    ys = _i32(ys_padded)
    yn = _i32(yn)
    N, Um1 = ys.shape
    _, _, _, su = compact_offsets(np.ones_like(yn), yn)
    out = np.empty((su,), np.int32)
    written = _lib().rnnt_pack_labels_i32(
        _ptr(ys, ctypes.c_int), _ptr(yn, ctypes.c_int), N, Um1,
        _ptr(out, ctypes.c_int),
    )
    assert written == su
    return out


def scatter_compact_grads(grads2, loc, grad_costs, xn, yn, V, blank=0):
    """Compact (STU, 2) grads -> (STU, V), scaled per sample by grad_costs."""
    grads2 = _f32(grads2)
    loc = _i32(loc)
    gc = _f32(grad_costs)
    xn = _i32(xn)
    yn = _i32(yn)
    N = xn.shape[0]
    sizes = xn.astype(np.int64) * (yn.astype(np.int64) + 1)
    cum = np.cumsum(sizes).astype(np.int64)
    stu = int(cum[-1])
    out = np.zeros((stu, V), np.float32)
    st = _lib().rnnt_scatter_compact_grads_f32(
        _ptr(grads2, ctypes.c_float), _ptr(loc, ctypes.c_int),
        _ptr(gc, ctypes.c_float), _ptr(cum, ctypes.c_int64),
        N, stu, V, blank, _ptr(out, ctypes.c_float),
    )
    if st != 0:
        raise ValueError(f"native scatter failed with status {st}")
    return out
