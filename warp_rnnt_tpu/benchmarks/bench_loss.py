"""Loss benchmark reproducing the reference README table configs
(`/root/reference/README.md:35-55`, driven like
`pytorch_binding/benchmark.py`): mean ms/batch of loss(+grad), device-
synchronized, on random log-softmax inputs."""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from warp_rnnt_tpu import rnnt_loss

CONFIGS = [
    # (T, U_labels, V, iters)
    (150, 40, 28, 100),
    (150, 20, 5000, 50),
    (1500, 300, 50, 10),
]


def use_flat_layout(N, T, U, V, dtype=jnp.float32):
    """Layout the table feeds at each config — 4D everywhere, after
    measurement.  The hypothesis that flat-native feeding wins above the
    >4 GiB gather cliff was REFUTED on hardware: at N=128, T=150, V=5000
    both layouts sit at the same gather+write floor (4D 22.6 ms loss+grad
    vs flat 23.3 with row-major layouts pinned and the grad writer aliased
    into the donated buffer; the forward gather costs ~10.5 ms either way —
    two flat take_along_axis calls at ~13 ns/element vs one 4D slow-path
    call at ~26 ns/element; `scripts/exp_colgather.py`,
    `scripts/exp_flat_alias.py`).  The flat path remains fully supported
    and near-parity for callers whose producer emits the lattice flat; the
    table reports the 4D number as the production default."""
    del N, T, U, V, dtype
    return False


def flat_layout_cliff(N, T, U, V, dtype=jnp.float32):
    """True above the >4 GiB operand size where the 4D gather leaves XLA's
    fast path (`functional/gather._FLAT3D_BYTES`) — the regime the flat
    (N, T, U*V) layout and its Pallas grad writer exist for."""
    from warp_rnnt_tpu.functional.gather import _FLAT3D_BYTES

    return jnp.dtype(dtype).itemsize * N * T * (U + 1) * V > _FLAT3D_BYTES


def make_batch(key, N, T, U, V, dtype=jnp.float32, flat=False):
    """Random benchmark inputs.

    The log-prob tensor is generated inside ONE jit (normal + log_softmax
    fused).  Above ~6 GB that fusion needs two resident buffers (normal is
    re-read by the row reductions, so it materializes; two 11.6 GB buffers
    would OOM at N=128, T=1500) — there a single-buffer unnormalized
    surrogate is generated instead.  The loss kernels have no data-dependent
    control flow, so timing is identical.

    flat=True emits the (N, T, (U+1)*V) flat layout (see `use_flat_layout`).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    shape = (N, T, (U + 1) * V) if flat else (N, T, U + 1, V)
    nbytes = jnp.dtype(dtype).itemsize * N * T * (U + 1) * V
    if nbytes <= 6 << 30:
        xs = jax.jit(
            lambda k: jax.nn.log_softmax(
                jax.random.normal(k, (N, T, U + 1, V), dtype), axis=-1
            ).reshape(shape)
        )(k1)
    else:
        import math

        xs = jax.jit(
            lambda k: jax.random.normal(k, shape, dtype) * 0.5 - math.log(V)
        )(k1)
    ys = jax.random.randint(k2, (N, U), 1, V, jnp.int32)
    xn = jnp.full((N,), T, jnp.int32)
    yn = jax.random.randint(k3, (N,), U // 2 + 1, U + 1, jnp.int32)
    return xs, ys, xn, yn


def run_loss_bench(N, T, U, V, iters, grad=True, impl="auto",
                   dtype=jnp.float32, donate=True, flat=None):
    """Mean ms per loss(+grad) call, dependency-forced (see `timing.py`).

    grad=True: each iteration's gradient is fed back as the next iteration's
    donated input — serializes the chain, prevents the runtime from eliding
    work, and models steady-state training memory (without donation the
    dispatch loop keeps two full-size gradient buffers in flight, which OOMs
    at N=64, T=1500 even though the compiled program peaks at 12.4 GB).

    grad=False: a donated scalar accumulator sums every iteration's costs.
    """
    from warp_rnnt_tpu.benchmarks.timing import (
        bench_grad_chain, bench_scalar_chain,
    )

    key = jax.random.PRNGKey(0)
    if flat is None:
        flat = use_flat_layout(N, T, U, V, dtype)
    xs, ys, xn, yn = make_batch(key, N, T, U, V, dtype, flat=flat)

    if grad:
        def loss_vg(xs):
            return jax.value_and_grad(
                lambda x: rnnt_loss(
                    x, ys, xn, yn, reduction="mean", gather=True, impl=impl
                )
            )(xs)

        # Donated chain = lowest memory (input reused for the gradient) —
        # required for the configs where two log-prob buffers don't fit.
        # But donation-aliased executions flakily fail through the remote
        # tunnel (FAILED_PRECONDITION) and the failure poisons the whole
        # process, so the fallback must come from the CALLER in a fresh
        # process (run_table flips donate=False on retry).
        kw = {"donate_argnums": 0} if donate else {}
        if flat:
            # Pin row-major layouts on the log-prob parameter and the
            # gradient output via the public helper (otherwise XLA picks
            # {0,2,1} at an isolated jit boundary and reconciles with the
            # row-major Mosaic grad writer through full-tensor transpose
            # copies — measured 71.8 ms loss+grad vs 23.1 pinned at N=128,
            # V=5000; see `flat_arg_formats` and scripts/exp_flat_alias.py).
            from warp_rnnt_tpu import flat_arg_formats

            arg_fmt, grad_fmt = flat_arg_formats()
            kw["in_shardings"] = arg_fmt
            kw["out_shardings"] = (None, grad_fmt)
            xs = jax.jit(lambda a: a, out_shardings=arg_fmt)(xs)
        step = jax.jit(loss_vg, **kw)
        return bench_grad_chain(step, xs, iters)

    def fwd(xs):
        return rnnt_loss(xs, ys, xn, yn, reduction="none", gather=True, impl=impl)

    return bench_scalar_chain(fwd, (xs,), iters, reduce_out=jnp.sum)


def main():
    print(f"backend={jax.default_backend()} device={jax.devices()[0].device_kind}")
    for T, U, V, iters in CONFIGS:
        for N in (1, 16, 32, 64, 128):
            try:
                ms = run_loss_bench(N, T, U, V, iters)
                print(f"T={T} U={U} V={V} N={N}: {ms:8.2f} ms/batch (loss+grad)")
            except Exception as e:  # noqa: BLE001
                print(f"T={T} U={U} V={V} N={N}: failed: {type(e).__name__}")


if __name__ == "__main__":
    main()
