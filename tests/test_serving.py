"""Serving path: Predictor + predict CLI on a trained run."""

import json
import os

import numpy as np

from vqa_transfer_externaldata_tpu.cli import predict as predict_cli
from vqa_transfer_externaldata_tpu.cli import train as train_cli
from tests.test_cli import TINY


def _train(tmp_path, model="vqa_attention"):
    return train_cli.main(TINY + [
        "--model.model", model,
        "--train.train_dir", str(tmp_path / f"{model}_run")])


def test_predictor_answers(tmp_path):
    from vqa_transfer_externaldata_tpu.serving import Predictor

    d = _train(tmp_path)
    pred = Predictor(d, batch_size=4)
    rng = np.random.default_rng(0)
    n_cells = 2 * 2
    feats = rng.normal(size=(5, n_cells, 16)).astype(np.float32)
    questions = ["w5 w6 w7", "w8", "w9 w10", "w11 w12 w13", "w14"]
    answers = pred.answer(feats, questions)
    assert len(answers) == 5
    assert all(a in pred.answer_vocab.token_to_id for a in answers)
    # deterministic: same inputs -> same answers
    assert answers == pred.answer(feats, questions)
    # batch padding must not change results (5 rows at batch 4)
    pred2 = Predictor(d, batch_size=8)
    assert answers == pred2.answer(feats, questions)

    # submit/result pipelining (round-5): two requests in flight, results
    # stay ordered and identical to the serial path
    feats_b = rng.normal(size=(5, n_cells, 16)).astype(np.float32)
    questions_b = ["w6 w7", "w9", "w10 w11", "w12", "w13 w14"]
    h1 = pred.submit(feats, questions)
    h2 = pred.submit(feats_b, questions_b)
    assert pred.result(h1) == answers
    assert pred.result(h2) == pred.answer(feats_b, questions_b)

    # pre-staged device features (skip the per-request upload) answer
    # identically, including the padded tail chunk
    import jax

    dev_feats = jax.device_put(feats)
    assert pred.answer(dev_feats, questions) == answers

    # store-backed serving: stage a grid store once, answer by row index
    # (ids-only requests; the gather happens on device)
    store = rng.normal(size=(7, 2, 2, 16)).astype(np.float32)  # [M,g,g,C]
    pred.stage_store(store)
    idx = np.array([6, 0, 3, 3, 5])
    from_store = pred.answer_indexed(idx, questions)
    direct = pred.answer(store.reshape(7, n_cells, 16)[idx], questions)
    assert from_store == direct
    import pytest as _pytest

    fresh = Predictor(d, batch_size=4)
    with _pytest.raises(ValueError, match="stage_store"):
        fresh.answer_indexed(idx, questions)


def test_predict_cli_with_feature_store(tmp_path):
    from vqa_transfer_externaldata_tpu.data.features import extract_features

    d = _train(tmp_path)
    # tiny raw store with ids 100..102 (grid 2x2 needs image_size 64, but
    # the run was trained with feature_dim 16 -> build matching npz store)
    rng = np.random.default_rng(1)
    store_path = str(tmp_path / "store.npz")
    np.savez(store_path,
             grid=rng.normal(size=(3, 2, 2, 16)).astype(np.float16),
             pool5=rng.normal(size=(3, 16)).astype(np.float32),
             image_ids=np.array([100, 101, 102]))
    answers = predict_cli.main([
        "--train_dir", d, "--feature_path", store_path,
        "--image_id", "101",
        "--question", "w5 w6", "--question", "w7 w8 w9"])
    assert len(answers) == 2


def _tiny_torch_resnet_pth(tmp_path):
    """Tiny torchvision-naming resnet (stages 1,1,1,1 width 8) -> .pth."""
    import torch
    import torch.nn as tnn

    class B(tnn.Module):
        def __init__(self, cin, width, stride):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(width)
            self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(width)
            self.conv3 = tnn.Conv2d(width, 4 * width, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(4 * width)
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, 4 * width, 1, stride, bias=False),
                tnn.BatchNorm2d(4 * width))

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 8, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(8)
            self.layer1 = tnn.Sequential(B(8, 8, 1))
            self.layer2 = tnn.Sequential(B(32, 16, 2))
            self.layer3 = tnn.Sequential(B(64, 32, 2))
            self.layer4 = tnn.Sequential(B(128, 64, 2))

    torch.manual_seed(7)
    net = Net()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    path = str(tmp_path / "resnet_tiny.pth")
    torch.save(net.state_dict(), path)
    return path


def test_end2end_pretrained_backbone_and_serving(tmp_path):
    """BASELINE config 5: converted torch weights enter the end2end model
    at init (params + frozen BN stats), survive training untouched, persist
    into params_final, and Predictor answers from raw uint8 images
    (regressions: random frozen backbone; ScopeCollectionNotFound)."""
    import pytest

    torch = pytest.importorskip("torch")
    import jax
    import numpy as np

    from vqa_transfer_externaldata_tpu.ops.resnet import (
        convert_torch_state_dict)
    from vqa_transfer_externaldata_tpu.serving import Predictor
    from vqa_transfer_externaldata_tpu.utils.checkpoint import load_params

    pth = _tiny_torch_resnet_pth(tmp_path)
    args = TINY + [
        "--model.model", "vqa_end2end", "--data.image_size", "64",
        "--model.resnet_checkpoint", pth,
        "--model.resnet_stages", "1,1,1,1", "--model.resnet_width", "8",
        "--train.max_steps", "2", "--train.checkpoint_every", "2",
        "--train.train_dir", str(tmp_path / "e2e_run")]
    train_dir = train_cli.main(args)

    sd = torch.load(pth, map_location="cpu", weights_only=True)
    want_params, want_stats = convert_torch_state_dict(
        {k: v.numpy() for k, v in sd.items()}, stage_sizes=(1, 1, 1, 1),
        stem="space_to_depth")

    final = load_params(os.path.join(train_dir, "params_final"))
    assert "extra_vars" in final  # BN stats persisted with the artifact
    got = final["params"]["resnet"]["conv1"]["kernel"]
    np.testing.assert_allclose(np.asarray(got),
                               want_params["conv1"]["kernel"], rtol=1e-6)
    got_stats = final["extra_vars"]["batch_stats"]["resnet"]["bn1"]["mean"]
    np.testing.assert_allclose(np.asarray(got_stats),
                               want_stats["bn1"]["mean"], rtol=1e-6)

    predictor = Predictor(train_dir, batch_size=4)
    images = np.random.default_rng(0).integers(
        0, 256, size=(3, 64, 64, 3)).astype(np.uint8)
    answers = predictor.answer(images, ["what is this?"] * 3)
    assert len(answers) == 3
    assert all(isinstance(a, str) for a in answers)
