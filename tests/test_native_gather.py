"""Native record-gather library: build, correctness vs numpy, fallback."""

import numpy as np

from livelyspeaker_tpu.data.native import (
    gather_rows,
    gather_rows_transpose,
    get_lib,
)


def test_native_lib_builds():
    lib = get_lib()
    assert lib is not None, "g++ build of record_gather.so failed"


def test_gather_rows_matches_numpy(rng_np):
    src = rng_np.normal(size=(100, 7, 5)).astype(np.float32)
    idx = rng_np.integers(0, 100, size=33)
    out = gather_rows(src, idx, n_threads=2)
    np.testing.assert_array_equal(out, src[idx])


def test_gather_rows_int32(rng_np):
    src = rng_np.integers(0, 1000, size=(50, 9)).astype(np.int32)
    idx = np.array([3, 3, 49, 0])
    out = gather_rows(src, idx)
    np.testing.assert_array_equal(out, src[idx])


def test_gather_rows_transpose(rng_np):
    src = rng_np.normal(size=(20, 34, 27)).astype(np.float32)
    idx = np.array([5, 0, 19])
    out = gather_rows_transpose(src, idx)
    np.testing.assert_array_equal(out, src[idx].transpose(0, 2, 1))


def test_batch_across_shards(tmp_path, rng_np):
    """ShardedDataset.batch with indices spanning shards + order fidelity."""
    from livelyspeaker_tpu.data import ShardedDataset, ShardWriter

    w = ShardWriter(str(tmp_path / "ds"), shard_size=4)
    for i in range(10):
        w.add(x=np.full((3,), i, np.float32), tag=f"t{i}")
    w.finish()
    ds = ShardedDataset(str(tmp_path / "ds"))
    order = [9, 0, 5, 3, 9, 1]
    b = ds.batch(order)
    np.testing.assert_array_equal(b["x"][:, 0], np.array(order, np.float32))
    assert b["tag"] == [f"t{i}" for i in order]
