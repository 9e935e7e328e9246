"""Differentiable RNN-T loss core on gathered (blank, emit) lattices.

`rnnt_core` is the single entry point every public API variant (padded, the
gather trick, compact/packed) lowers to.  It is a `jax.custom_vjp`:

  * primal (not differentiated, e.g. pure inference under jit): ONE backward
    sweep computes the costs — mirroring the reference compact-mode
    `required_grad=false` fast path (`core_compact.cu:371-378`).
  * fwd (under jax.grad/vjp): forward+backward sweeps, gradients w.r.t. the
    gathered log-probs are fully computed in the forward pass and stashed as
    residuals; the bwd rule is a single elementwise multiply by the upstream
    cotangent — exactly the reference autograd contract
    (`pytorch_binding/warp_rnnt/__init__.py:21-24`).

Backends ("impl"):
  * "scan":   pure-JAX column scan (`scan_impl`), any platform.
  * "pallas": Pallas TPU kernels (`warp_rnnt_tpu.ops`).
  * "auto":   pallas on TPU, scan otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from warp_rnnt_tpu.functional import scan_impl


def _select_impl(impl: str) -> str:
    if impl == "auto":
        try:
            platform = jax.devices()[0].platform
        except RuntimeError:
            platform = "cpu"
        return "pallas" if platform == "tpu" else "scan"
    return impl


class _PlatformDispatch:
    """Lowering-time backend dispatch via `jax.lax.platform_dependent`.

    The trace-time device check in `_select_impl("auto")` sees the HOST
    platform, which is wrong for cross-platform lowering (multi-platform
    `jax.export` / jax2tf serialized for cpu AND tpu — the path behind the
    TF graph op, `bindings/tf_binding.py`).  This backend defers the choice
    to lowering: the tpu lowering gets the Mosaic column kernel (interpret
    forced off — the host backend may be cpu during export), every other
    platform gets the pure-XLA scan.  Matches the reference's TF binding
    running the same fast kernels as torch (`tensorflow_binding/binding.cpp:
    139-157`).
    """

    @staticmethod
    def _pallas():
        from warp_rnnt_tpu.ops import pallas_impl

        return pallas_impl

    @staticmethod
    def forward_backward(blank_lp, emit_lp, xn, yn, fastemit_lambda):
        pallas_impl = _PlatformDispatch._pallas()
        return jax.lax.platform_dependent(
            blank_lp, emit_lp, xn, yn,
            tpu=functools.partial(
                pallas_impl.forward_backward,
                fastemit_lambda=fastemit_lambda, interpret=False,
            ),
            default=functools.partial(
                scan_impl.forward_backward, fastemit_lambda=fastemit_lambda
            ),
        )

    @staticmethod
    def costs_only(blank_lp, emit_lp, xn, yn):
        pallas_impl = _PlatformDispatch._pallas()
        return jax.lax.platform_dependent(
            blank_lp, emit_lp, xn, yn,
            tpu=functools.partial(pallas_impl.costs_only, interpret=False),
            default=scan_impl.costs_only,
        )


def _backend(impl: str):
    impl = _select_impl(impl)
    if impl == "scan":
        return scan_impl
    if impl == "platform":
        return _PlatformDispatch
    if impl in ("pallas", "pallas_col"):
        # column-scan kernel: the TPU path (zero relayout overhead).  A
        # diagonal-wavefront kernel (one LSE per cell, the algorithmic
        # minimum) was built and removed: its XLA-side shear/unshear
        # relayouts made it 3x slower end-to-end, and a roofline analysis
        # showed the lattice sweep is <15% of loss+grad time at every
        # benchmark config, so even a free diagonal DP cannot pay for an
        # in-kernel shear (see docs/DESIGN.md "Kernel choices").
        from warp_rnnt_tpu.ops import pallas_impl

        return pallas_impl
    raise ValueError(f"unknown impl: {impl!r}")


def _forward_backward(blank_lp, emit_lp, xn, yn, fastemit_lambda, impl):
    return _backend(impl).forward_backward(
        blank_lp, emit_lp, xn, yn, fastemit_lambda
    )


def _costs_only(blank_lp, emit_lp, xn, yn, impl):
    return _backend(impl).costs_only(blank_lp, emit_lp, xn, yn)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def rnnt_core(xs_gathered, xn, yn, fastemit_lambda=0.0, impl="auto"):
    """Per-sample negative log-likelihoods for gathered lattices.

    Args:
      xs_gathered: (N, T, U, 2) log-probs; channel 0 = blank, 1 = next label.
      xn, yn: (N,) int32 frame/label lengths.
      fastemit_lambda: static float, FastEmit regularization weight.
      impl: static str backend selector.

    Returns:
      costs: (N,) float32.
    """
    blank_lp = xs_gathered[..., 0]
    emit_lp = xs_gathered[..., 1]
    return _costs_only(blank_lp, emit_lp, xn, yn, impl)


def _rnnt_core_fwd(xs_gathered, xn, yn, fastemit_lambda, impl):
    blank_lp = xs_gathered[..., 0]
    emit_lp = xs_gathered[..., 1]
    costs, g_blank, g_emit, _, _ = _forward_backward(
        blank_lp, emit_lp, xn, yn, fastemit_lambda, impl
    )
    grads = jnp.stack([g_blank, g_emit], axis=-1).astype(xs_gathered.dtype)
    return costs, (grads,)


def _rnnt_core_bwd(fastemit_lambda, impl, res, ct):
    # None cotangents for the integer length args (symbolic-shape safe —
    # np.zeros(float0) cannot express a polymorphic batch dim under export).
    (grads,) = res
    d_xs = grads * ct[:, None, None, None].astype(grads.dtype)
    return d_xs, None, None


rnnt_core.defvjp(_rnnt_core_fwd, _rnnt_core_bwd)


def rnnt_core_with_internals(xs_gathered, xn, yn, fastemit_lambda=0.0, impl="auto"):
    """Non-differentiable debug/conformance entry: returns
    (costs, grads (N,T,U,2), alphas, betas)."""
    blank_lp = xs_gathered[..., 0]
    emit_lp = xs_gathered[..., 1]
    costs, g_blank, g_emit, alphas, betas = _forward_backward(
        blank_lp, emit_lp, xn, yn, fastemit_lambda, impl
    )
    return costs, jnp.stack([g_blank, g_emit], axis=-1), alphas, betas
