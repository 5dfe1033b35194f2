"""Raw-image ingest pipeline + multi-glimpse variant."""

import numpy as np
import jax
import pytest

from vqa_transfer_externaldata_tpu.data.ingest import (
    ImageQuestionDataset, coco_image_path)


def test_coco_image_path():
    assert coco_image_path("/d", "train2014", 42).endswith(
        "COCO_train2014_000000000042.jpg")


def test_image_question_dataset(tmp_path):
    from PIL import Image

    paths = []
    for i in range(3):
        p = str(tmp_path / f"img{i}.jpg")
        Image.fromarray(np.full((30, 40, 3), 50 * i, np.uint8)).save(p)
        paths.append(p)
    arrays = {
        "q_ids": np.zeros((6, 4), np.int32),
        "answer_id": np.full((6,), 4, np.int32),
        "image_index": np.array([0, 1, 2, 0, 1, 2], np.int32),
    }
    ds = ImageQuestionDataset(arrays, paths, image_size=32,
                              decode_workers=2)
    batch = next(ds.batches(4, shuffle=False, epochs=1))
    assert batch["images"].shape == (4, 32, 32, 3)
    assert batch["images"].dtype == np.uint8
    # row 1 decodes image 1 (constant 50)
    assert 45 <= int(batch["images"][1].mean()) <= 55
    ds.close()


def test_grain_pipeline(tmp_path):
    from PIL import Image

    from vqa_transfer_externaldata_tpu.data.grain_loader import (
        make_grain_dataset)

    paths = []
    for i in range(3):
        p = str(tmp_path / f"g{i}.jpg")
        Image.fromarray(np.full((20, 20, 3), 40 * i, np.uint8)).save(p)
        paths.append(p)
    arrays = {
        "q_ids": np.arange(24, dtype=np.int32).reshape(8, 3),
        "answer_id": np.arange(8, dtype=np.int32),
        "image_index": np.array([0, 1, 2, 0, 1, 2, 0, 1], np.int32),
    }
    ds = make_grain_dataset(arrays, paths, image_size=16, batch_size=4,
                            seed=3)
    batches = list(ds)
    assert len(batches) == 2
    b = batches[0]
    assert b["images"].shape == (4, 16, 16, 3)
    assert b["q_ids"].shape == (4, 3)
    # deterministic epoch order
    ds2 = make_grain_dataset(arrays, paths, image_size=16, batch_size=4,
                             seed=3)
    b2 = next(iter(ds2))
    np.testing.assert_array_equal(b["answer_id"], b2["answer_id"])
    # image matches its row's image_index
    row0_img = int(b["image_index"][0])
    assert abs(int(b["images"][0].mean()) - 40 * row0_img) <= 5


def test_two_glimpse_trains(tiny_config, tmp_path):
    """vqa_attention2 learns (loss decreases) through the multi-glimpse
    attention path on the shared trainer."""
    from vqa_transfer_externaldata_tpu.data.datasets import load_dataset
    from vqa_transfer_externaldata_tpu.models.zoo import build_model
    from vqa_transfer_externaldata_tpu.parallel.trainer import Trainer

    cfg = tiny_config.replace_flat({"model.model": "vqa_attention2"})
    spec = build_model(cfg)
    ds = load_dataset(cfg, "train")
    tr = Trainer(cfg, spec, train_dir=str(tmp_path / "g2"))
    state = tr.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    state = tr.fit(ds.batches(cfg.train.batch_size, seed=0), state,
                   max_steps=40)
    import json, os

    with open(os.path.join(str(tmp_path / "g2"), "metrics.jsonl")) as fh:
        losses = [json.loads(l)["train/loss"] for l in fh
                  if "train/loss" in l]
    assert losses[-1] < losses[0] * 0.9, losses
    tr.close()


def test_two_glimpse_variant(tiny_config):
    from vqa_transfer_externaldata_tpu.data.datasets import load_dataset
    from vqa_transfer_externaldata_tpu.models.zoo import build_model

    cfg = tiny_config.replace_flat({"model.model": "vqa_attention2"})
    spec = build_model(cfg)
    ds = load_dataset(cfg, "train")
    batch = next(ds.batches(4, epochs=1, shuffle=False))
    params = spec.module.init({"params": jax.random.PRNGKey(0)},
                              *spec.inputs(batch), train=False)
    out = spec.module.apply(params, *spec.inputs(batch), train=False)
    assert out["logits"].shape == (4, cfg.data.num_answers)
    # two softmaxes over the grid
    alpha = np.asarray(out["alpha"])
    assert alpha.shape == (4, cfg.data.grid_h * cfg.data.grid_w, 2)
    np.testing.assert_allclose(alpha.sum(1), 1.0, rtol=1e-4)
    loss, _ = spec.loss(out, batch)
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: spec.loss(spec.module.apply(
        p, *spec.inputs(batch), train=False), batch)[0])(params)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_grain_iterator_joins_feature_store(tmp_path):
    """--data.input_pipeline grain over a feature-store-backed dataset:
    every batch must carry the joined features/pool5 keys (the join runs
    per row through JoinedDataset.take)."""
    from vqa_transfer_externaldata_tpu.data.features import (
        FeatureStore, JoinedDataset)
    from vqa_transfer_externaldata_tpu.data.grain_loader import (
        GrainTrainIterator)

    rng = np.random.default_rng(0)
    M, n = 4, 16
    store_path = str(tmp_path / "store.npz")
    np.savez(store_path,
             grid=rng.normal(size=(M, 2, 2, 8)).astype(np.float16),
             pool5=rng.normal(size=(M, 8)).astype(np.float32),
             image_ids=np.arange(M, dtype=np.int64))
    rows = {
        "q_ids": rng.integers(0, 9, size=(n, 3)).astype(np.int32),
        "answer_id": rng.integers(0, 5, size=n).astype(np.int32),
        "image_index": rng.integers(0, M, size=n).astype(np.int32),
    }
    ds = JoinedDataset(rows, FeatureStore(store_path),
                       index_key="image_index",
                       feature_keys=("features", "pool5"))
    it = GrainTrainIterator(ds, batch_size=8, seed=0)
    batch = next(it)
    assert batch["features"].shape == (8, 4, 8)  # grid flattened to [N, C]
    assert batch["pool5"].shape == (8, 8)
    # The joined features match the store row each sample points at.
    ref = np.asarray(np.load(store_path)["grid"],
                     np.float16).reshape(M, 4, 8)
    for b in range(8):
        np.testing.assert_array_equal(
            np.asarray(batch["features"][b], np.float16),
            ref[int(batch["image_index"][b])])


def test_grain_iterator_shards_are_disjoint_and_cover():
    """shard=(pi, pc): every process batches a disjoint stride of the SAME
    seeded epoch permutation with local batch_size/pc rows (the Trainer
    assembles the global batch from process-local rows)."""
    from vqa_transfer_externaldata_tpu.data.datasets import ArrayDataset
    from vqa_transfer_externaldata_tpu.data.grain_loader import (
        GrainTrainIterator)

    n = 24
    rows = {"answer_id": np.arange(n, dtype=np.int32)}
    ds = ArrayDataset(rows)
    global_batch = 8
    full = next(GrainTrainIterator(ds, batch_size=global_batch, seed=1))
    shard0 = next(GrainTrainIterator(ds, batch_size=global_batch, seed=1,
                                     shard=(0, 2)))
    shard1 = next(GrainTrainIterator(ds, batch_size=global_batch, seed=1,
                                     shard=(1, 2)))
    assert shard0["answer_id"].shape == (4,)
    assert shard1["answer_id"].shape == (4,)
    a, b = set(shard0["answer_id"].tolist()), set(shard1["answer_id"].tolist())
    assert not (a & b), "shards overlap"
    # Unsharded batch = stride-interleave of the two shards' rows.
    assert a | b == set(full["answer_id"].tolist())

    # size % pc != 0: the permutation is trimmed to a multiple of pc so
    # both processes' slices have EQUAL length and their epoch boundaries
    # stay aligned (unequal grain slices drift parent-epoch computation —
    # the same sample could appear on two processes in one global batch).
    odd = ArrayDataset({"answer_id": np.arange(25, dtype=np.int32)})
    it0 = GrainTrainIterator(odd, batch_size=8, seed=2, shard=(0, 2))
    it1 = GrainTrainIterator(odd, batch_size=8, seed=2, shard=(1, 2))
    seen0, seen1 = [], []
    for _ in range(6):  # two epochs of the 12-element slices
        seen0.append(next(it0)["answer_id"])
        seen1.append(next(it1)["answer_id"])
    for b0, b1 in zip(seen0, seen1):
        assert not (set(b0.tolist()) & set(b1.tolist())), (b0, b1)


def test_data_iter_state_pruned_with_checkpoints(tmp_path):
    """data_iter_<step>.json files follow Orbax's keep-N pruning: states
    whose model checkpoint was dropped are deleted (they are unusable)."""
    import glob
    import os

    import jax.numpy as jnp

    from vqa_transfer_externaldata_tpu.utils.checkpoint import (
        CheckpointManager)

    mgr = CheckpointManager(str(tmp_path), keep=2, save_every=1)
    state = {"w": jnp.zeros((2,))}
    for step in (1, 2, 3, 4):
        assert mgr.save(step, state, force=True)
        mgr.wait()
        mgr.save_data_iter(step, {"next_index": step * 10})
    mgr.close()
    left = sorted(os.path.basename(p) for p in glob.glob(
        os.path.join(str(tmp_path), "ckpt", "data_iter_*.json")))
    kept = {int(p.split("_")[2].split(".")[0]) for p in left}
    assert 4 in kept and len(kept) <= 3, left  # old states pruned
    assert mgr.restore_data_iter(4) == {"next_index": 40}
