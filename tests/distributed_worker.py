"""Worker for the 2-process jax.distributed test (spawned by
test_multiprocess_distributed.py; not a pytest module).

Each process owns 2 virtual CPU devices -> 4 global devices.  Both processes
generate the SAME full batch from a fixed seed, feed only their local half
through `global_batch`, compute the sharded loss, and check the replicated
result against the NumPy oracle on the full batch.

Usage: python distributed_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.device_count()

    from warp_rnnt_tpu.parallel import rnnt_loss_shard_map
    from warp_rnnt_tpu.parallel.multihost import global_batch, pod_mesh
    from warp_rnnt_tpu.reference.numpy_oracle import transduce_batch

    mesh = pod_mesh()

    # identical full batch on every process (seeded)
    rng = np.random.RandomState(0)
    N, T, U, V = 4 * nproc, 12, 4, 6
    logits = rng.randn(N, T, U, V).astype(np.float32)
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    ys = rng.randint(1, V, size=(N, U - 1)).astype(np.int32)
    xn = rng.randint(T - 3, T + 1, size=(N,)).astype(np.int32)
    yn = rng.randint(1, U, size=(N,)).astype(np.int32)

    lo, hi = pid * 4, (pid + 1) * 4
    batch = global_batch(mesh, (lp[lo:hi], ys[lo:hi], xn[lo:hi], yn[lo:hi]))

    loss = jax.jit(
        lambda *a: rnnt_loss_shard_map(mesh, *a, reduction="mean")
    )(*batch)

    costs, _, _, _ = transduce_batch(lp, ys, xn, yn)
    expected = float(np.mean(costs))
    got = float(loss)
    assert abs(got - expected) < 1e-4, (got, expected)
    print(f"DISTRIBUTED_OK pid={pid} loss={got:.6f} expected={expected:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
