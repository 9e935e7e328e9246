"""Driver benchmark: headline RNN-T loss config on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": ms, "unit": "ms", "vs_baseline": speedup}

Config matches the reference's strongest published number: N=32, T=150, U=20,
V=5000, gather path — 12.35 ms/batch on an RTX 2070 Super
(`/root/reference/README.md:46`).  Our measurement is strictly harder: the
reference times the forward call only (grads stashed w.r.t. the gathered
(N,T,U,2) lattice, backward scatter untimed), while this times jitted
value_and_grad w.r.t. the full (N,T,U,V) log-prob tensor, including the
backward scatter into all 2 GB of it.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from warp_rnnt_tpu import rnnt_loss

BASELINE_MS = 12.35  # warp_rnnt gather=True, N=32 T=150 U=20 V=5000 (README.md:46)


def main():
    N, T, U, V = 32, 150, 20, 5000
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    log_probs = jax.nn.log_softmax(
        jax.random.normal(k1, (N, T, U + 1, V), jnp.float32), axis=-1
    )
    ys = jax.random.randint(k2, (N, U), 1, V, jnp.int32)
    xn = jnp.full((N,), T, jnp.int32)
    yn = jnp.full((N,), U, jnp.int32)

    # Timing methodology: every iteration feeds its gradient back as the
    # next iteration's (donated) input, so no execution can be elided or
    # overlapped — the chain is fully serialized by data dependencies (the
    # kernels have no data-dependent control flow, so timing is input-
    # independent).  Naive `out = step(x)` loops measure fantasy numbers in
    # this environment (dropped outputs let the runtime skip queued work).
    def loss_vg(x):
        return jax.value_and_grad(
            lambda z: rnnt_loss(z, ys, xn, yn, reduction="mean", gather=True)
        )(x)

    from warp_rnnt_tpu.benchmarks.timing import bench_grad_chain

    # non-donated chain: two 2 GB buffers fit trivially, and donation-aliased
    # executions flakily fail through this environment's remote tunnel
    best = bench_grad_chain(jax.jit(loss_vg), log_probs,
                            iters=50, warmup=3, repeats=3)

    print(
        json.dumps(
            {
                "metric": "rnnt_loss+grad ms/batch (N=32,T=150,U=20,V=5000, gather)",
                "value": round(best, 3),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / best, 3),
            }
        ),
        flush=True,
    )


def _run_with_retry():
    """The remote-execution tunnel flakes (RESOURCE_EXHAUSTED / HTTP 500 /
    FAILED_PRECONDITION) and a failure poisons the JAX client, so retries
    must run in fresh subprocesses.  The measurement itself happens in a
    child ('--child'); the parent just relays the JSON line."""
    import subprocess

    last_err = "no attempt produced output"
    for attempt in range(3):
        if attempt:
            time.sleep(30)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                capture_output=True, text=True, timeout=1500,
            )
        except subprocess.TimeoutExpired as e:
            # a hang is exactly the tunnel flake the retry loop exists for
            last_err = f"attempt {attempt}: timeout after 1500s"
            if e.stderr:
                last_err += "\n" + e.stderr[-2000:]
            continue
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
                return
        last_err = f"attempt {attempt}: exit {proc.returncode}\n" + proc.stderr[-2000:]
    sys.stderr.write(last_err + "\n")
    sys.exit(1)


if __name__ == "__main__":
    if "--child" in sys.argv:
        main()
    else:
        _run_with_retry()
