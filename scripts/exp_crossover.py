"""Measure the fused-vs-padded crossover behind the router's `_FUSED_MIN_V`.

Round-4 verdict item 3: the 48 MB routing boundary was a guess between two
points 23x apart (11 MB and 252 MB).  This sweeps the joint+loss+backward
step (bench_joint's exact measurement: value_and_grad w.r.t. params, random
lengths, dependency-forced calibrated timing) across logits volumes of
~13-413 MB at N=16, T=150, U=20 for H=256, plus an H=512 column (the fused
kernel's tanh-recompute and V->128 padding costs scale with H), and records
the rows under `benchmarks_endtoend.json: fused_padded_crossover`.

Each config runs in its own subprocess, serialized, with retries (the
remote tunnel's failures poison the JAX client).

    python scripts/exp_crossover.py
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "benchmarks_endtoend.json")

N, T, U = 16, 150, 20
SWEEP = [(256, v) for v in (64, 128, 256, 512, 1024, 2048)] + [
    (512, v) for v in (128, 256, 512)
]


def _run(mode, H, V):
    for attempt in range(3):
        if attempt:
            time.sleep(30)
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "warp_rnnt_tpu.benchmarks.bench_joint",
                 mode, str(N), str(T), str(U), str(V), str(H),
                 "--rand-length"],
                capture_output=True, text=True, timeout=1800, cwd=ROOT,
            )
        except subprocess.TimeoutExpired:
            print(f"  attempt {attempt}: timeout", flush=True)
            continue
        rows = [json.loads(l) for l in proc.stdout.splitlines()
                if l.startswith("{")]
        if rows:
            return rows[0]["step_ms"]
        print(f"  attempt {attempt}: exit {proc.returncode}\n"
              + proc.stderr[-1000:], flush=True)
    raise RuntimeError(f"{mode} H={H} V={V} failed")


def main():
    data = json.load(open(OUT)) if os.path.exists(OUT) else {}
    sec = data.get("fused_padded_crossover", {})
    rows = {(r["H"], r["V"]): r for r in sec.get("rows", [])}
    for H, V in SWEEP:
        logits_mb = 4 * N * T * (U + 1) * V / (1 << 20)
        row = rows.get((H, V), {"H": H, "V": V,
                                "logits_mb": round(logits_mb, 1)})
        for mode, key in (("from_logits", "padded_ms"), ("fused", "fused_ms")):
            if key in row:
                continue
            print(f"H={H} V={V} ({logits_mb:.0f} MB) {mode}", flush=True)
            row[key] = _run(mode, H, V)
            rows[(H, V)] = row
            data["fused_padded_crossover"] = {
                "note": (f"N={N}, T={T}, U={U}, random lengths; joint+loss+"
                         "backward step ms (bench_joint); backs the "
                         "layout-router boundary joint_loss._FUSED_MIN_V"),
                "rows": sorted(rows.values(),
                               key=lambda r: (r["H"], r["V"])),
            }
            json.dump(data, open(OUT, "w"), indent=1)
            print(f"  -> {row}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
