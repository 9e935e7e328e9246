"""True multi-controller test: 2 OS processes, jax.distributed, 4 global
devices (2 virtual CPU devices per process), sharded loss vs NumPy oracle.

The reference has no distributed support at all (SURVEY §2); this validates
the framework's multi-host path — coordinator bring-up, pod mesh, per-process
local shards assembled via `jax.make_array_from_process_local_data`, psum'd
loss — the same code that runs on a real pod slice.
"""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_loss():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    try:
        outs = [p.communicate(timeout=240)[0] for p in procs]
    finally:
        # never leak workers: stray python children racing for the device
        # are a documented hazard in this environment (CLAUDE.md)
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"DISTRIBUTED_OK pid={pid}" in out, out[-3000:]
