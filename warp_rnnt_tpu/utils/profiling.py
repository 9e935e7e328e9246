"""Profiling/observability helpers (SURVEY §5 aux-subsystem parity).

The reference ships NVVP screenshots and uses torch.profiler +
`torch.cuda.max_memory_allocated` in its end-to-end benchmark
(`pytorch_binding/benchmark2.py:15,146-160`).  TPU equivalents:

  * `trace(path)` — context manager around `jax.profiler` producing an
    XProf/TensorBoard-compatible trace;
  * `op_breakdown(trace_dir)` — parse the chrome trace and aggregate
    per-op device time (how every kernel in this repo was tuned);
  * `device_memory_stats()` — live HBM usage of the first device;
  * `timeit(fn, *args)` — dependency-forced wall-clock timing (see
    `warp_rnnt_tpu.benchmarks.timing`: naive block_until_ready loops measure
    fantasy numbers in this environment because the runtime elides queued
    executions whose outputs are dropped).
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json

import jax


@contextlib.contextmanager
def trace(path: str):
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def op_breakdown(trace_dir: str, top: int = 25):
    """Aggregate device-op durations from the newest trace under trace_dir.

    Returns a list of (total_microseconds, op_name), descending.
    """
    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    events = json.load(gzip.open(files[-1]))["traceEvents"]
    dur = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "")
            if name.startswith(("$", "jit", "Pjit")):
                continue
            dur[name] += e["dur"]
    return [(d, name) for name, d in dur.most_common(top)]


def device_memory_stats(device=None):
    """HBM stats dict for a device (bytes_in_use, peak_bytes_in_use, ...)."""
    d = device or jax.devices()[0]
    stats = d.memory_stats()
    return dict(stats) if stats else {}


def compiled_memory_mb(jitted, *args):
    """Peak HBM of a jitted program from XLA's compile-time memory analysis
    (arguments + outputs + temporaries − donation aliasing), in MiB.

    Works where runtime `memory_stats()` is unavailable (e.g. remote-tunnel
    backends); this is the compiler's own accounting of what the program
    allocates, the TPU analogue of `torch.cuda.max_memory_allocated`
    (`/root/reference/pytorch_binding/benchmark2.py:159`)."""
    ma = jitted.lower(*args).compile().memory_analysis()
    if ma is None:
        return 0.0
    total = (
        ma.argument_size_in_bytes
        + ma.output_size_in_bytes
        + ma.temp_size_in_bytes
        - ma.alias_size_in_bytes
    )
    return total / 2**20


def timeit(fn, *args, iters: int = 20, warmup: int = 3):
    """Mean wall-clock ms per call, every call forced by a data dependency
    (a donated scalar accumulator sums all of fn's outputs)."""
    from warp_rnnt_tpu.benchmarks.timing import bench_scalar_chain

    return bench_scalar_chain(fn, args, iters, warmup=warmup)
