"""Trustworthy TPU timing helpers.

Two measurement hazards in this environment, both discovered the hard way:

  * ELISION: the remote runtime can skip queued executions whose outputs are
    dropped before they run.  A naive `for: out = fn(x)` loop keeps only the
    last output alive and can report "10 iterations of a 2 GB copy in
    0.03 ms".  Every iteration must be REQUIRED by a data dependency.
  * CONSTANT SYNC COST: finishing a timed region (block_until_ready or a
    host readback) costs a ~30-60 ms tunnel round trip, independent of the
    work.  Dividing one timed loop by its iteration count therefore biases
    every result up by RTT/iters.

The fix for the first is chaining: feed each step's gradient back as the
next step's (donated) input, or thread a donated scalar accumulator through
every call.  The fix for the second is TWO-POINT calibration: time the chain
at two iteration counts and report the marginal cost

    ms/iter = (T(iters_hi) - T(iters_lo)) / (iters_hi - iters_lo)

which cancels the constant exactly.  Chains have no cross-iteration overlap
(each step depends on the previous), so the marginal cost is the true
serialized per-call device time.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _two_point(run, iters, repeats):
    """run(k) executes k chained iterations then syncs; returns best
    marginal ms/iter over `repeats` (lo, hi) pairs.

    The sync cost is large (~30-60 ms) AND noisy, so the iteration count is
    grown adaptively until the (T_hi - T_lo) signal comfortably exceeds that
    noise — otherwise sub-ms per-iter costs drown (and can even come out
    negative)."""
    k = max(iters, 4)
    for _ in range(8):  # growth attempts
        lo = max(2, k // 4)
        hi = lo + k
        t0 = time.perf_counter()
        run(lo)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(hi)
        t_hi = time.perf_counter() - t0
        if t_hi - t_lo > 0.25 or k >= 4096:
            break
        k *= 4
    best = (t_hi - t_lo) / (hi - lo) * 1000.0
    for _ in range(repeats - 1):
        t0 = time.perf_counter()
        run(lo)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(hi)
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (hi - lo) * 1000.0)
    return max(best, 0.0)


def bench_grad_chain(step, x0, iters, warmup=3, repeats=2):
    """step: donated jitted fn x -> (aux, x_like).  Returns marginal ms/call.

    The end-of-run sync reads back `aux` (a small fresh output of the final
    step) rather than the chained buffer: all of a program's outputs
    materialize together, so this forces the whole chain — and it avoids a
    tunnel bug where device->host reads derived from a donation-aliased
    buffer fail with FAILED_PRECONDITION at certain sizes (~1 GB observed).
    """
    def sync(aux):
        leaf = jax.tree_util.tree_leaves(aux)[0]
        np.asarray(jnp.ravel(leaf)[:1])

    state = {"x": x0}
    aux = None
    for _ in range(warmup):
        aux, state["x"] = step(state["x"])
    sync(aux)

    def run(k):
        x = state["x"]
        for _ in range(k):
            aux, x = step(x)
        state["x"] = x
        sync(aux)

    return _two_point(run, iters, repeats)


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
    """Marginal ms/call of `fn(*args)` with dependency-forced iterations."""
    step = make_scalar_chain(fn, reduce_out)
    state = {"acc": jnp.zeros((), jnp.float32)}
    for _ in range(warmup):
        state["acc"] = step(state["acc"], *args)
    np.asarray(state["acc"])

    def run(k):
        acc = state["acc"]
        for _ in range(k):
            acc = step(acc, *args)
        state["acc"] = acc
        np.asarray(acc)

    return _two_point(run, iters, repeats)
