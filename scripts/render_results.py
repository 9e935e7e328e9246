"""Render benchmarks_results.json into warp_rnnt_tpu/benchmarks/RESULTS.md.

Usage: python scripts/render_results.py [in.json] [out.md]
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(in_path="benchmarks_results.json",
         out_path="warp_rnnt_tpu/benchmarks/RESULTS.md"):
    in_path = os.path.join(ROOT, in_path)
    out_path = os.path.join(ROOT, out_path)
    data = json.load(open(in_path))
    lines = [
        "# Benchmark results — reference README table on TPU",
        "",
        f"Device: **{data['device']}** (single chip). Reference column: "
        "warp_rnnt `gather=True` forward-only ms/batch on an RTX 2070 Super "
        "(`/root/reference/README.md:35-55`).",
        "",
        "Our `loss+grad` times jitted `value_and_grad` w.r.t. the full "
        "`(N, T, U+1, V)` log-prob tensor (input buffer donated — steady-state "
        "training memory); `fwd` is the beta-only inference sweep "
        "(no gradients). Each config runs in its own subprocess, serialized.",
        "",
        "| T | U | V | N | reference (ms) | loss+grad (ms) | fwd (ms) | speedup | grad-write GB/s (roofline) |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    HBM_GBPS = 819.0  # v5e HBM bandwidth
    for r in data["rows"]:
        ref = r.get("ref_gather_ms")
        ref_s = f"{ref:.2f}" if ref else "OOM"
        if "error" in r:
            lg = fw = "OOM" if "RESOURCE_EXHAUSTED" in r["error"] else "error"
            sp = bw_s = "—"
        else:
            flat = "†" if r.get("layout") == "flat3d" else ""
            lg = f"**{r['loss_grad_ms']:.2f}**{flat}"
            fw = f"{r['fwd_ms']:.2f}"
            sp = f"{ref / r['loss_grad_ms']:.1f}x" if ref else "∞ (ref OOM)"
            # the dense (N, T, U+1, V) fp32 gradient is the one unavoidable
            # full-tensor access of loss+grad; its write bandwidth vs the
            # HBM roofline bounds how much faster this row can ever get
            gb = r["N"] * r["T"] * (r["U"] + 1) * r["V"] * 4 / 1e9
            bw = gb / (r["loss_grad_ms"] / 1e3)
            bw_s = f"{bw:.0f} ({bw / HBM_GBPS:.0%})"
        lines.append(
            f"| {r['T']} | {r['U']} | {r['V']} | {r['N']} | {ref_s} | {lg} | {fw} | {sp} | {bw_s} |"
        )
    lines += [
        "",
        "Notes:",
        "",
        "- The reference number is *forward-only* (its grads are stashed "
        "w.r.t. the pre-gathered `(N,T,U,2)` lattice; the backward scatter "
        "into `(N,T,U,V)` is untimed autograd work). Our loss+grad column "
        "includes that scatter — a strictly harder measurement.",
        "- Timing is dependency-forced AND two-point calibrated "
        "(see `timing.py`): every iteration's execution is required by the "
        "next (the remote runtime elides un-needed queued work), and the "
        "per-call time is the marginal (T_hi-T_lo)/(iters_hi-iters_lo) "
        "across two chain lengths, which cancels the environment's "
        "constant ~30-60 ms sync cost exactly. Chains serialize on data "
        "dependencies, so the marginal is true per-batch device time.",
        "- † rows feed the flat `(N, T, (U+1)*V)` production layout: above "
        "the ~4 GiB gather cliff a 4D operand leaves XLA's fast indexing "
        "path, so the public API accepts the lattice natively 3-D and the "
        "gradient is written in flat coordinates by a Pallas kernel "
        "(`functional/gather.py`, `ops/flat_kernels.py`).",
        "- Rows marked OOM exceed single-chip HBM for inputs+grads in fp32; "
        "the reference OOMs on its 8 GB GPU in the same rows and earlier "
        "(T=150/U=20/V=5000 at N=64 already OOMs there but runs here).",
        "- The roofline column divides the dense fp32 gradient tensor's size "
        "(the one unavoidable full-tensor access in loss+grad — forward "
        "reads are sparse at large V) by the measured time, as a fraction "
        "of the 819 GB/s v5e HBM bandwidth. Rows near 100% cannot be "
        "materially improved on this chip without changing the gradient "
        "contract; small-N rows are latency-bound, not bandwidth-bound.",
        "",
        "## End-to-end benchmarks (same chip, calibrated timing; "
        "`benchmarks_endtoend.json`)",
        "",
        "- Lattice sweep alone (N=32, T=1500, U=301): column Pallas kernel "
        "**1.71 ms** fused alpha+beta / **1.00 ms** beta-only; pure-XLA "
        "scan 22.1 ms (`scripts/bench_kernels.py`).",
    ]
    try:
        e2e = json.load(open(os.path.join(ROOT, "benchmarks_endtoend.json")))
    except FileNotFoundError:
        e2e = None
    # Collectors re-render after EVERY save (collect_endtoend._save), so a
    # mid-collection file may hold partial sections (e.g. joint_loss_backward
    # with only full_lengths measured yet): render what exists, never crash.
    j = e2e.get("joint_loss_backward") if e2e else None
    if j and "full_lengths" in j and "random_lengths" in j:
        cfg = j["config"]
        lines += [
            f"- Joint + loss + backward (N={cfg['N']}, T={cfg['T']}, "
            f"U={cfg['U']}, V={cfg['V']}, H={cfg['H']}, "
            "`benchmarks/bench_joint.py`), program HBM from XLA's "
            "compile-time memory analysis:",
            "",
            "| layout | full lengths | random lengths |",
            "|---|---|---|",
        ]
        by_mode = {
            "full": {r["mode"]: r for r in j["full_lengths"]},
            "rand": {r["mode"]: r for r in j["random_lengths"]},
        }
        labels = {
            "log_softmax+gather": "padded log_softmax+gather",
            "from_logits": "fused from-logits",
            "compact": "compact (packed joint + packed loss)",
            "fused": "fused joint+loss kernel (logits never in HBM)",
        }
        for mode, label in labels.items():
            f_, r_ = by_mode["full"].get(mode), by_mode["rand"].get(mode)
            if f_ is None or r_ is None:
                continue
            lines.append(
                f"| {label} | {f_['step_ms']:.1f} ms / "
                f"{f_['program_hbm_mb']:.0f} MiB | {r_['step_ms']:.1f} ms / "
                f"{r_['program_hbm_mb']:.0f} MiB |"
            )
        pad_r = by_mode["rand"].get("log_softmax+gather")
        cmp_r = by_mode["rand"].get("compact")
        if pad_r and cmp_r:
            speed = pad_r["step_ms"] / cmp_r["step_ms"]
            mem = pad_r["program_hbm_mb"] / cmp_r["program_hbm_mb"]
            lines += [
                "",
                "  The compact path computes only the sum(xn*(yn+1)) valid "
                f"lattice cells: at random lengths it is **{speed:.1f}x faster "
                f"and {mem:.1f}x lighter** than the padded path (the "
                "reference's published compact win on GPU is ~15% time / ~22% "
                "memory, `pytorch_binding/benchmark2.py`).  The fused "
                "from-logits path wins by never running log_softmax (or its "
                "backward) over the (N,T,U,V) tensor.",
            ]
        fz = by_mode["full"].get("fused")
        if fz and by_mode["full"].get("log_softmax+gather"):
            # MXU utilization of the fused step: forward projection +
            # backward's recompute, d_h, and d_W matmuls = 4 passes over
            # the N*T*(U+1) x H x V joint GEMM (2 FLOP/MAC); everything
            # else in the step is O(H^2) or O(N*T*U) and negligible.
            MXU_PEAK_TFLOPS = 197.0  # v5e bf16
            u_rows = cfg["U"] + 1
            flops = 8.0 * cfg["N"] * cfg["T"] * u_rows * cfg["H"] * cfg["V"]
            tfs = flops / (fz["step_ms"] / 1e3) / 1e12
            pad_f = by_mode["full"]["log_softmax+gather"]
            lines += [
                "",
                "  The fused joint+loss kernel never materializes the "
                "(N,T,U,V) logits in HBM in either direction "
                f"(**{fz['program_hbm_mb']:.0f} MiB program footprint vs "
                f"{pad_f['program_hbm_mb']:.0f} MiB padded — the ~1 GiB "
                "logits/log-probs buffers are gone**) and runs the step's "
                "4 MXU passes (forward projection, backward recompute, d_h, "
                f"d_W) at **{tfs:.0f} TFLOP/s = "
                f"{tfs / MXU_PEAK_TFLOPS:.0%} of the v5e bf16 MXU peak**. "
                "The reference architecture cannot express this op: it "
                "requires materialized log-probs "
                "(`/root/reference/README.md:59`).",
            ]
    if e2e:
        dec = e2e.get("decode")
        if dec:
            c = dec["config"]
            lines += [
                f"- Inference decoding (N={c['N']}, T={c['T']}, V={c['V']}, "
                f"H={c['hidden']}, `benchmarks/bench_decode.py`): greedy "
                f"**{dec['greedy_ms']:.1f} ms/batch = "
                f"{dec['greedy_utts_per_s']:.0f} utts/s**, beam-{c['beam']} "
                f"{dec['beam_ms']:.0f} ms/batch = "
                f"{dec['beam_utts_per_s']:.0f} utts/s — fully jitted "
                "batched decoders; the reference ships no decoder at all.",
            ]
        stm = e2e.get("streaming")
        if stm:
            c = stm["config"]
            lines += [
                f"- Streaming session (N={c['N']} concurrent streams, "
                f"{c['chunk_frames']}-frame chunks, V={c['V']}, "
                f"H={c['hidden']}, `benchmarks/bench_streaming.py`): "
                f"**{stm['chunk_ms']:.2f} ms per chunk step** (stateful "
                "chunked encode + incremental greedy decode, one jitted "
                f"step) = {stm['frames_per_s']:.0f} frames/s — "
                f"~{stm['realtime_factor_at_100fps']:.0f}x real time at a "
                "100 frames/s feature rate.  Chunked output equals one-shot "
                "`greedy_decode` bit-for-bit (hardware-gated, "
                "`scripts/tpu_check.py`).",
            ]
        sh = e2e.get("sharded_overhead")
        if sh:
            c = sh["config"]
            lines += [
                f"- GSPMD partitioning overhead (headline config N={c['N']}, "
                f"T={c['T']}, U={c['U']}, V={c['V']}; `scripts/tpu_check.py`): "
                f"loss+grad via `rnnt_loss_shard_map` on a 1-device mesh "
                f"**{sh['shard_map_ms']:.2f} ms** vs unsharded "
                f"{sh['unsharded_ms']:.2f} ms "
                f"({sh['overhead_ms']:+.2f} ms) — the partitioned lowering "
                "itself is free; pod scaling cost is collectives only.",
            ]
        bc = e2e.get("joint_loss_backward_by_config")
        if bc:
            lines += [
                "- Layout sweep over the reference table shapes (random "
                "lengths, N=16, H=256; joint+loss+backward step ms):",
                "",
                "| T | U | V | padded | from-logits | compact | fused | routed (`layout=\"auto\"`) |",
                "|---|---|---|---|---|---|---|---|",
            ]
            for r in bc["rows"]:
                fused_s = (f"{r['fused_ms']:.2f}"
                           if r.get("fused_ms") is not None else "—")
                routed_s = (f"**{r['routed_ms']:.2f}**"
                            if r.get("routed_ms") is not None else "—")
                lines.append(
                    f"| {r['T']} | {r['U']} | {r['V']} | "
                    f"{r['padded_ms']:.2f} | {r['from_logits_ms']:.2f} | "
                    f"{r['compact_ms']:.2f} | {fused_s} | {routed_s} |"
                )
            lines += [
                "",
                "  The routed column is the public `rnnt_loss_joint"
                "(layout=\"auto\")` surface — the dispatcher must match the "
                "per-shape winner (the reference's \"compact never loses\" "
                "property, delivered by routing instead of by a "
                "universally-dominant layout).",
                "",
            ]
        lr = e2e.get("large_gather_row")
        if lr and "loss_grad_ms" in lr:
            c = lr["config"]
            hist = ""
            if lr.get("round2_loss_grad_ms"):
                hist = (f" (round-2 4D layout: {lr['round2_loss_grad_ms']} ms;"
                        f" round-1: {lr.get('round1_loss_grad_ms')} ms)")
            lines += [
                f"- Largest gather row (N={c['N']}, T={c['T']}, U={c['U']}, "
                f"V={c['V']}, {lr.get('layout', '4d')} layout): loss+grad "
                f"**{lr['loss_grad_ms']:.2f} ms**, fwd {lr['fwd_ms']:.2f} ms"
                + hist + ".",
            ]
        sc = e2e.get("scaling")
        if sc:
            lines += [
                "- Data-parallel scaling (`benchmarks/bench_scaling.py`): "
                "virtual 8-device CPU mesh run recorded (harness + sharded "
                "compile/execute proven; throughput is flat on the single "
                "shared host core by construction). The >=90% BASELINE "
                "efficiency target is **pending a real pod slice** — one "
                "command there.",
            ]
        tr = e2e.get("train_step")
        if tr and tr.get("rows"):
            tcfg = tr["config"]
            best = min(tr["rows"], key=lambda r: r["step_ms"])
            lines += [
                "- Full training step — conv-GLU encoder + GRU predictor + "
                f"bf16 joint + loss + adamw (N={tcfg['N']}, T={tcfg['T']}, "
                f"U={tcfg['U']}, V={tcfg['V']}, H={tcfg['hidden']}, "
                f"{tcfg['params_m']}M params): **{best['step_ms']:.1f} "
                f"ms/step = {best['utts_per_s']:.0f} utts/s** on one chip "
                "(`benchmarks/bench_train.py`).",
            ]
            prof = tr.get("profile")
            if prof:
                lines += ["  " + prof["summary"]]
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path} ({len(data['rows'])} rows)")


if __name__ == "__main__":
    main(*sys.argv[1:])
