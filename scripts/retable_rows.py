"""Re-measure selected reference-table rows and merge into benchmarks_results.json.

Usage: python scripts/retable_rows.py N,T,U,V [N,T,U,V ...]

Each row runs in its own subprocess with the same retry/donation policy as
`run_table.main` (the remote tunnel flakes; donation-aliased executions can
FAILED_PRECONDITION and poison the client).  Rows feed the production
default 4D layout (measured winner at every config incl. the >4 GiB cliff —
see `bench_loss.use_flat_layout`); the flat (N, T, U*V) companion numbers at
the cliff are collected by `collect_endtoend.py large_row`.
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "benchmarks_results.json")


def remeasure(N, T, U, V, iters):
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
                text=True, timeout=1800, cwd=ROOT,
            )
        except subprocess.TimeoutExpired:
            msg = "timeout (1800s)"
            continue
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                parsed = json.loads(line[len("RESULT "):])
        if parsed is not None:
            return parsed
        err = (proc.stderr or "").strip().splitlines()
        msg = err[-1][:300] if err else f"exit={proc.returncode}"
    raise RuntimeError(f"row N={N} T={T} U={U} V={V} failed: {msg}")


def main(*specs):
    data = json.load(open(OUT))
    for spec in specs:
        N, T, U, V = (int(x) for x in spec.split(","))
        iters = 30 if T * U <= 10000 else 10
        print(f"re-measuring N={N} T={T} U={U} V={V}", flush=True)
        r = remeasure(N, T, U, V, iters)
        for row in data["rows"]:
            if (row["N"], row["T"], row["U"], row["V"]) == (N, T, U, V):
                prev = {k: row.get(k) for k in
                        ("loss_grad_ms", "fwd_ms", "layout")}
                row.pop("error", None)
                row.update(r)
                print(f"  {prev} -> {r}", flush=True)
                break
        else:
            data["rows"].append({"T": T, "U": U, "V": V, "N": N,
                                 "ref_gather_ms": None, **r})
            print(f"  new row: {r}", flush=True)
        json.dump(data, open(OUT, "w"), indent=1)
    print(f"wrote {OUT}", flush=True)
    # keep the rendered document in lockstep with the data (verdict r4 #2)
    here = os.path.dirname(os.path.abspath(__file__))
    if here not in sys.path:
        sys.path.insert(0, here)
    import render_results

    render_results.main()


if __name__ == "__main__":
    main(*sys.argv[1:])
