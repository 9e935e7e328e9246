"""Refresh `benchmarks_endtoend.json` on real TPU hardware, reproducibly.

Each measurement runs in its own subprocess (the remote-execution tunnel's
failures poison the JAX client, and two TPU processes must never overlap —
see CLAUDE.md), serialized, with retries.  Sections can be run selectively:

    python scripts/collect_endtoend.py [joint] [by_config] [train] [decode] [large_row]

with no args every section runs.  RESULTS.md is re-rendered from the data by
`scripts/render_results.py` afterwards (run it in the same commit).
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "benchmarks_endtoend.json")


def _run_json_lines(argv, timeout=2400, attempts=3):
    """Run a benchmark CLI in a fresh subprocess; return parsed JSON lines."""
    for attempt in range(attempts):
        if attempt:
            time.sleep(30)
        try:
            proc = subprocess.run(
                [sys.executable, "-m"] + argv, capture_output=True, text=True,
                timeout=timeout, cwd=ROOT,
            )
        except subprocess.TimeoutExpired:
            print(f"  attempt {attempt}: timeout", flush=True)
            continue
        rows = [json.loads(l) for l in proc.stdout.splitlines()
                if l.startswith("{")]
        if rows:
            return rows
        print(f"  attempt {attempt}: exit {proc.returncode}\n"
              + proc.stderr[-1500:], flush=True)
    raise RuntimeError(f"no output from {argv}")


def _load():
    return json.load(open(OUT)) if os.path.exists(OUT) else {}


def _save(data):
    json.dump(data, open(OUT, "w"), indent=1)
    print(f"wrote {OUT}", flush=True)
    _rerender()


def _rerender():
    """Re-render RESULTS.md after every save so the committed document can
    never drift from the data (round-4 verdict weak #2)."""
    here = os.path.dirname(os.path.abspath(__file__))
    if here not in sys.path:
        sys.path.insert(0, here)
    import render_results

    render_results.main()


JOINT_MODES = ("log_softmax+gather", "from_logits", "compact", "fused")


def collect_joint():
    """Headline joint+loss+backward A/B at N=16, T=150, U=20, V=5000, H=256."""
    data = _load()
    sec = {"config": {"N": 16, "T": 150, "U": 20, "V": 5000, "H": 256}}
    for key, flag in (("full_lengths", []), ("random_lengths", ["--rand-length"])):
        rows = []
        for mode in JOINT_MODES:
            print(f"joint {key} {mode}", flush=True)
            (r,) = _run_json_lines(
                ["warp_rnnt_tpu.benchmarks.bench_joint", mode] + flag
            )
            rows.append({"mode": mode, "step_ms": r["step_ms"],
                         "program_hbm_mb": r["peak_hbm_mb"]})
        sec[key] = rows
        data["joint_loss_backward"] = sec
        _save(data)


BY_CONFIG_SHAPES = ((150, 40, 28), (150, 20, 5000), (1500, 300, 50))


def collect_by_config():
    """Padded vs from-logits vs compact vs fused at the reference table
    shapes, random lengths, N=16 H=256 (VERDICT r2 item 2: compact must not
    lose anywhere now that the packed movement runs as Pallas DMA kernels)."""
    data = _load()
    rows = []
    for (T, U, V) in BY_CONFIG_SHAPES:
        row = {"T": T, "U": U, "V": V}
        for mode, key in (("log_softmax+gather", "padded_ms"),
                          ("from_logits", "from_logits_ms"),
                          ("compact", "compact_ms"),
                          ("fused", "fused_ms"),
                          ("auto", "routed_ms")):
            print(f"by_config T={T} U={U} V={V} {mode}", flush=True)
            (r,) = _run_json_lines(
                ["warp_rnnt_tpu.benchmarks.bench_joint", mode,
                 "16", str(T), str(U), str(V), "256", "--rand-length"]
            )
            row[key] = r["step_ms"]
        rows.append(row)
        data["joint_loss_backward_by_config"] = {
            "note": ("random lengths, N=16, H=256; compact movement runs as "
                     "Pallas offset-DMA kernels (ops/packed_kernels.py)"),
            "rows": rows,
        }
        _save(data)


def collect_train():
    data = _load()
    rows = []
    for loss_mode in ("gather", "from_logits", "fused"):
        print(f"train {loss_mode}", flush=True)
        (r,) = _run_json_lines(
            ["warp_rnnt_tpu.benchmarks.bench_train",
             "32", "400", "40", "1024", loss_mode]
        )
        rows.append({"loss_mode": loss_mode, "step_ms": r["step_ms"],
                     "utts_per_s": r["utts_per_s"]})
        cfg = {k: r[k] for k in ("N", "T", "U", "V") if k in r}
        cfg.update({"hidden": 512, "params_m": r.get("params_m")})
        data["train_step"] = {"config": cfg, "rows": rows}
        _save(data)


def collect_decode():
    data = _load()
    print("decode", flush=True)
    (r,) = _run_json_lines(["warp_rnnt_tpu.benchmarks.bench_decode"])
    data["decode"] = {
        "config": {"N": r.get("N", 32), "T": r.get("T", 400),
                   "V": r.get("V", 1024), "hidden": 512, "beam": 4,
                   "max_length": 100},
        "greedy_ms": r["greedy_ms"], "greedy_utts_per_s": r["greedy_utts_per_s"],
        "beam_ms": r["beam_ms"], "beam_utts_per_s": r["beam_utts_per_s"],
    }
    _save(data)


def collect_large_row():
    """The N=128, V=5000 row, BOTH layouts: 4D (the measured production
    default at the cliff) and flat (N, T, U*V) (near-parity; for producers
    that emit the lattice flat — row-major layouts pinned, Pallas grad
    writer aliased into the donated buffer)."""
    data = _load()
    print("large_row", flush=True)

    def measure(flat):
        code = (
            "from warp_rnnt_tpu.benchmarks.run_table import run_one;"
            f"run_one(128, 150, 20, 5000, 10, donate=%s, flat={flat})"
        )
        for attempt, donate in ((0, True), (1, True), (2, False)):
            if attempt:
                time.sleep(30)
            try:
                proc = subprocess.run(
                    [sys.executable, "-c", code % donate],
                    capture_output=True, text=True, timeout=2400, cwd=ROOT,
                )
            except subprocess.TimeoutExpired:
                continue
            for l in proc.stdout.splitlines():
                if l.startswith("RESULT "):
                    return json.loads(l[len("RESULT "):])
            print(f"  attempt {attempt}: exit {proc.returncode}\n"
                  + proc.stderr[-1500:], flush=True)
        raise RuntimeError(f"large_row flat={flat} failed")

    r4d = measure(False)
    prev = data.get("large_gather_row", {})
    data["large_gather_row"] = {
        "config": {"N": 128, "T": 150, "U": 20, "V": 5000},
        "loss_grad_ms": r4d["loss_grad_ms"], "fwd_ms": r4d["fwd_ms"],
        "layout": "4d",
        "round1_loss_grad_ms": prev.get("round1_loss_grad_ms"),
        "round1_fwd_ms": prev.get("round1_fwd_ms"),
    }
    _save(data)
    rfl = measure(True)
    data["large_gather_row"]["flat_loss_grad_ms"] = rfl["loss_grad_ms"]
    data["large_gather_row"]["flat_fwd_ms"] = rfl["fwd_ms"]
    _save(data)


SECTIONS = {
    "joint": collect_joint,
    "by_config": collect_by_config,
    "train": collect_train,
    "decode": collect_decode,
    "large_row": collect_large_row,
}


if __name__ == "__main__":
    picks = sys.argv[1:] or list(SECTIONS)
    for name in picks:
        SECTIONS[name]()
