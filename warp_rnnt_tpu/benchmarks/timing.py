"""Trustworthy TPU timing helpers.

Naive timing loops (`for: out = fn(x)` + `block_until_ready`) are WRONG in
this environment, in both directions:

  * the remote runtime can elide/cancel queued executions whose outputs are
    dropped before they run — a loop that rebinds `out` each iteration keeps
    only the last execution's outputs alive, and measured "10 iterations of
    a 2 GB copy in 0.03 ms" (impossible);
  * a device->host readback costs ~50 ms of tunnel RTT, so per-iteration
    synchronization (the reference's `cuda.synchronize()` methodology,
    `pytorch_binding/benchmark.py:15-48`) would swamp the signal.

The fix: make every iteration's execution REQUIRED by a data dependency and
pay one readback at the end, amortized over the iterations:

  * `bench_grad_chain`: feed each step's gradient back as the next step's
    (donated) input.  The kernels have no data-dependent control flow, so
    timing is input-independent; donation also models steady-state training
    memory (activations are transient in a real train step).
  * `bench_scalar_chain`: thread a tiny donated accumulator through every
    call (`acc' = acc + reduce(fn(args))`), serializing iterations without
    adding measurable work.  For forward/inference benchmarks whose outputs
    cannot be fed back.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_grad_chain(step, x0, iters, warmup=3, repeats=2):
    """step: donated jitted fn x -> (aux, x_like).  Returns best mean ms."""
    x = x0
    for _ in range(warmup):
        _, x = step(x)
    jax.block_until_ready(x)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            _, x = step(x)
        jax.block_until_ready(x)
        best = min(best, (time.perf_counter() - t0) / iters * 1000.0)
    return best


def make_scalar_chain(fn, reduce_out=None):
    """Wrap `fn(*args) -> pytree` as `step(acc, *args) -> acc'` with the
    accumulator donated, so every execution is data-required.

    CAUTION: fn and the reduction are jitted TOGETHER, so XLA dead-code-
    eliminates whatever the reduction does not depend on.  The default
    (full sum of every output leaf) forces all of fn's work at the price of
    one extra read of fn's outputs; pass a cheaper `reduce_out` only when
    the outputs are opaque to XLA (e.g. a pallas_call) or the reduction
    provably depends on all the work being timed."""
    if reduce_out is None:
        def reduce_out(out):
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.asarray(l).astype(jnp.float32).sum()
                       for l in leaves)

    @jax.jit
    def _step(acc, *args):
        return acc + reduce_out(fn(*args))

    return jax.jit(_step, donate_argnums=0)


def bench_scalar_chain(fn, args, iters, warmup=3, repeats=2, reduce_out=None):
    """Best mean ms/call of `fn(*args)` with dependency-forced iterations."""
    step = make_scalar_chain(fn, reduce_out)
    acc = jnp.zeros((), jnp.float32)
    for _ in range(warmup):
        acc = step(acc, *args)
    jax.block_until_ready(acc)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = step(acc, *args)
        jax.block_until_ready(acc)
        np.asarray(acc)
        best = min(best, (time.perf_counter() - t0) / iters * 1000.0)
    return best
