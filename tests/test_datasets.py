"""ArrayDataset batching semantics: determinism, sharding, epochs."""

import numpy as np
import pytest

from vqa_transfer_externaldata_tpu.data.datasets import ArrayDataset


def _ds(n=64):
    return ArrayDataset({"x": np.arange(n, dtype=np.int64)})


def test_epoch_permutation_deterministic():
    a = [b["x"] for b in _ds().batches(8, seed=5, epochs=2)]
    b = [b["x"] for b in _ds().batches(8, seed=5, epochs=2)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # different seed -> different order
    c = next(_ds().batches(8, seed=6, epochs=1))
    assert not np.array_equal(a[0], c["x"])


def test_epoch_covers_every_row_once():
    seen = np.concatenate([b["x"] for b in _ds().batches(8, epochs=1)])
    assert sorted(seen.tolist()) == list(range(64))


def test_sharded_epochs_partition_the_data():
    shards = [
        np.concatenate([b["x"] for b in
                        _ds().batches(8, seed=1, epochs=1, shard=(k, 4))])
        for k in range(4)
    ]
    allrows = np.concatenate(shards)
    assert sorted(allrows.tolist()) == list(range(64))
    # shards are disjoint
    assert len(set(allrows.tolist())) == 64
    # batch_size is the GLOBAL batch: each process yields its 8/4=2 local
    # rows of every global batch (the trainer assembles the global array
    # from process-local rows; fit_resident splits identically).
    first = next(_ds().batches(8, seed=1, epochs=1, shard=(0, 4)))
    assert first["x"].shape[0] == 2
    # every process produces the SAME batch count (unequal counts would
    # hang a multi-host step) even when size % n != 0
    ds = ArrayDataset({"x": np.arange(27)})
    counts = {k: len(list(ds.batches(4, seed=1, epochs=1, shard=(k, 4))))
              for k in range(4)}
    assert len(set(counts.values())) == 1, counts


def test_drop_last_and_small_dataset_error():
    ds = ArrayDataset({"x": np.arange(10)})
    batches = list(ds.batches(4, epochs=1))
    assert len(batches) == 2  # 10 // 4
    with pytest.raises(ValueError, match="no batch"):
        next(ds.batches(16, epochs=1))
