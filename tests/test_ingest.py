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
