"""Reproduce the full reference README benchmark table on TPU.

Each config runs in its own subprocess so an out-of-memory config (e.g.
N=128, V=5000 needs ~32 GB of HBM for inputs+grads — the reference OOMs at
N=64 already) cannot poison the later configs' TPU state.

Writes one JSON line per row; `main` aggregates into a results file.
"""

import json
import subprocess
import sys
import time

REFERENCE_GATHER_MS = {
    (150, 40, 28): {1: 0.54, 16: 1.72, 32: 2.94, 64: 5.54, 128: 10.74},
    (150, 20, 5000): {1: 0.80, 16: 6.24, 32: 12.35, 64: None, 128: None},
    (1500, 300, 50): {1: 4.99, 16: 78.88, 32: 157.86, 64: None, 128: None},
}


def run_one(N, T, U, V, iters, donate=True, flat=None):
    """Entry point used in the per-config subprocess.

    flat=None feeds the production-default layout (4D — see
    bench_loss.use_flat_layout for the measured rationale); flat=True
    forces the flat (N, T, U*V) layout with row-major jit layouts pinned.
    """
    from warp_rnnt_tpu.benchmarks.bench_loss import run_loss_bench, use_flat_layout

    if flat is None:
        flat = use_flat_layout(N, T, U, V)
    out = {
        "loss_grad_ms": round(
            run_loss_bench(N, T, U, V, iters, grad=True, donate=donate,
                           flat=flat), 3
        ),
        "fwd_ms": round(
            run_loss_bench(N, T, U, V, iters, grad=False, flat=flat), 3
        ),
    }
    if flat:
        out["layout"] = "flat3d"
    print("RESULT " + json.dumps(out))


def main(out_path="benchmarks_results.json"):
    results = []
    for (T, U, V), ref_rows in REFERENCE_GATHER_MS.items():
        iters = 30 if T * U <= 10000 else 10
        for N in (1, 16, 32, 64, 128):
            row = {"T": T, "U": U, "V": V, "N": N, "ref_gather_ms": ref_rows[N]}
            # Transient failures are common through the remote-execution
            # tunnel (stale memory between subprocesses surfaces as
            # RESOURCE_EXHAUSTED, compile-helper restarts as HTTP 500,
            # donation-aliased executions as FAILED_PRECONDITION): retry
            # in a fresh subprocess with a cooldown, switching to the
            # non-donated chain on the final attempt.
            parsed, msg = None, None
            for attempt in range(3):
                if attempt:
                    time.sleep(30)
                donate = attempt < 2
                code = (
                    "from warp_rnnt_tpu.benchmarks.run_table import run_one;"
                    f"run_one({N},{T},{U},{V},{iters},donate={donate})"
                )
                try:
                    proc = subprocess.run(
                        [sys.executable, "-c", code], capture_output=True,
                        text=True, timeout=1200,
                    )
                except subprocess.TimeoutExpired:
                    # a hung child (wedged tunnel) is exactly the case the
                    # retry loop exists for — subprocess.run already killed it
                    msg = "timeout (1200s)"
                    continue
                for line in proc.stdout.splitlines():
                    if line.startswith("RESULT "):
                        parsed = json.loads(line[len("RESULT "):])
                if parsed is not None:
                    break
                err = (proc.stderr or "").strip().splitlines()
                msg = err[-1][:200] if err else f"exit={proc.returncode}"
                if "RESOURCE_EXHAUSTED" in proc.stderr:
                    msg = "OOM (RESOURCE_EXHAUSTED)"
            if parsed is None:
                row["error"] = msg
            else:
                row.update(parsed)
            results.append(row)
            print(json.dumps(row), flush=True)
    import jax

    with open(out_path, "w") as f:
        json.dump({"device": jax.devices()[0].device_kind, "rows": results}, f, indent=1)


if __name__ == "__main__":
    main(*sys.argv[1:])
