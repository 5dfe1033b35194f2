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
