"""Batching/bucketing utilities and multi-host helpers (single-process)."""

import numpy as np

import jax

from warp_rnnt_tpu.parallel.multihost import global_batch, pod_mesh
from warp_rnnt_tpu.utils.batching import (
    bucket_for,
    length_buckets,
    pack_labels_to_compact,
    pack_padded_to_compact,
    pad_batch,
    unpack_compact_to_padded,
)


def test_buckets_and_padding():
    buckets = length_buckets(160, 40, num_buckets=3)
    assert buckets[-1] == (160, 40)
    assert bucket_for(10, 3, buckets)[0] <= 160

    rng = np.random.RandomState(0)
    feats = [rng.randn(t, 8).astype(np.float32) for t in (7, 12, 9)]
    labels = [[1, 2], [3], [4, 5, 6]]
    f, ys, xn, yn = pad_batch(feats, labels, (12, 3))
    assert f.shape == (3, 12, 8)
    assert ys.shape == (3, 3)
    np.testing.assert_array_equal(xn, [7, 12, 9])
    np.testing.assert_array_equal(yn, [2, 1, 3])
    np.testing.assert_array_equal(ys[0], [1, 2, 0])
    np.testing.assert_allclose(f[0, :7], feats[0])
    assert np.all(f[0, 7:] == 0)


def test_compact_roundtrip():
    rng = np.random.RandomState(1)
    N, T, U, V = 3, 6, 4, 5
    xs = rng.randn(N, T, U, V).astype(np.float32)
    xn = np.array([6, 4, 5], np.int32)
    yn = np.array([3, 1, 2], np.int32)
    packed = pack_padded_to_compact(xs, xn, yn)
    assert packed.shape[0] == int(np.sum(xn * (yn + 1)))
    restored = unpack_compact_to_padded(packed, xn, yn, T=T, U=U)
    for i in range(N):
        np.testing.assert_array_equal(
            restored[i, : xn[i], : yn[i] + 1], xs[i, : xn[i], : yn[i] + 1]
        )
    ys = rng.randint(1, V, size=(N, U - 1)).astype(np.int32)
    packed_ys = pack_labels_to_compact(ys, yn)
    assert packed_ys.shape[0] == int(np.sum(yn))


def test_global_batch_single_process():
    mesh = pod_mesh()
    local = {
        "x": np.arange(16, dtype=np.float32).reshape(8, 2),
        "n": np.arange(8, dtype=np.int32),
    }
    batch = global_batch(mesh, local)
    assert batch["x"].shape == (8, 2)
    np.testing.assert_array_equal(np.asarray(batch["n"]), local["n"])
    # sharded over the data axis
    assert len(batch["x"].sharding.device_set) == jax.device_count()


def test_scaling_bench_on_virtual_devices():
    from warp_rnnt_tpu.benchmarks.bench_scaling import lattices_per_second

    lps1 = lattices_per_second(1, per_device_batch=2, T=16, U=4, iters=3)
    lps8 = lattices_per_second(8, per_device_batch=2, T=16, U=4, iters=3)
    assert lps1 > 0 and lps8 > 0
