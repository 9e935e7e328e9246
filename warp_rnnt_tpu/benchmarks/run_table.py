"""Reproduce the full reference README benchmark table on TPU.

Writes benchmarks/RESULTS.md with ms/batch for loss+grad (harder than the
reference's forward-only timing) and forward-only, per config/batch size.
"""

import json
import sys

import jax

from warp_rnnt_tpu.benchmarks.bench_loss import run_loss_bench

REFERENCE_GATHER_MS = {
    (150, 40, 28): {1: 0.54, 16: 1.72, 32: 2.94, 64: 5.54, 128: 10.74},
    (150, 20, 5000): {1: 0.80, 16: 6.24, 32: 12.35, 64: None, 128: None},
    (1500, 300, 50): {1: 4.99, 16: 78.88, 32: 157.86, 64: None, 128: None},
}


def main(out_path="benchmarks_results.json"):
    results = []
    dev = jax.devices()[0].device_kind
    for (T, U, V), ref_rows in REFERENCE_GATHER_MS.items():
        iters = 50 if T * U <= 10000 else 10
        for N in (1, 16, 32, 64, 128):
            row = {"T": T, "U": U, "V": V, "N": N, "ref_gather_ms": ref_rows[N]}
            try:
                row["loss_grad_ms"] = round(
                    run_loss_bench(N, T, U, V, iters, grad=True), 3
                )
                row["fwd_ms"] = round(
                    run_loss_bench(N, T, U, V, iters, grad=False), 3
                )
            except Exception as e:  # noqa: BLE001
                row["error"] = f"{type(e).__name__}: {e}"[:200]
            results.append(row)
            print(json.dumps(row), flush=True)
    with open(out_path, "w") as f:
        json.dump({"device": dev, "rows": results}, f, indent=1)


if __name__ == "__main__":
    main(*sys.argv[1:])
