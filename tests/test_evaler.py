"""Evaler semantics: full coverage, pad masking, official result format."""

import numpy as np

from vqa_transfer_externaldata_tpu.data.datasets import ArrayDataset
from vqa_transfer_externaldata_tpu.parallel.evaler import padded_batches
from vqa_transfer_externaldata_tpu.utils.vocab import UNK_ID


def test_padded_batches_cover_all_rows_and_mask_pads():
    n, bs = 10, 4
    ds = ArrayDataset({
        "q_ids": np.arange(n * 3, dtype=np.int32).reshape(n, 3),
        "answer_id": np.full((n,), 7, np.int32),
    })
    gen, total = padded_batches(ds, bs)
    batches = list(gen)
    assert total == n and len(batches) == 3
    flat_q = np.concatenate([b["q_ids"] for b in batches])[:n]
    np.testing.assert_array_equal(flat_q, ds.arrays["q_ids"])
    # padded rows are copies of row 0 but with <unk> answers (masked)
    last = batches[-1]
    assert last["answer_id"][2] == UNK_ID and last["answer_id"][3] == UNK_ID
    np.testing.assert_array_equal(last["q_ids"][2], ds.arrays["q_ids"][0])
    # real rows keep their answers
    assert last["answer_id"][0] == 7


def test_padded_batches_exact_multiple_is_untouched():
    ds = ArrayDataset({"answer_id": np.full((8,), 3, np.int32)})
    gen, n = padded_batches(ds, 4)
    batches = list(gen)
    assert n == 8 and len(batches) == 2
    assert all((b["answer_id"] == 3).all() for b in batches)


def test_padded_batches_carry_example_mask():
    ds = ArrayDataset({"answer_id": np.full((10,), 3, np.int32)})
    gen, _ = padded_batches(ds, 4)
    batches = list(gen)
    np.testing.assert_array_equal(batches[0]["example_mask"], np.ones(4))
    np.testing.assert_array_equal(batches[-1]["example_mask"],
                                  [1.0, 1.0, 0.0, 0.0])


def test_eval_means_are_pad_invariant(tiny_config, tmp_path,
                                      eight_cpu_devices):
    """Split-level loss/accuracy must not depend on the eval batch size:
    valid-row weighting keeps the padded final batch from diluting means
    (regression: per-batch means were averaged unweighted)."""
    from vqa_transfer_externaldata_tpu.data.datasets import load_dataset
    from vqa_transfer_externaldata_tpu.models.zoo import build_model
    from vqa_transfer_externaldata_tpu.parallel.trainer import Trainer

    base = tiny_config.replace_flat({"model.model": "vqa_baseline",
                                     "model.dropout": 0.0,
                                     "data.synthetic_size": 24})
    ds = load_dataset(base, "val", stage="vqa", size=24)
    means = {}
    for bs in (8, 16):  # 24 rows: bs=8 exact, bs=16 pads 8 rows
        cfg = base.replace_flat({"train.batch_size": bs})
        spec = build_model(cfg)
        trainer = Trainer(cfg, spec, train_dir=str(tmp_path / f"ev{bs}"))
        state = trainer.init_state(
            next(ds.batches(1, epochs=1, shuffle=False)))
        m, preds = trainer.evaluate(state, padded_batches(ds, bs)[0])
        assert preds.shape[0] >= 24
        means[bs] = m
        trainer.close()
    for key in ("loss", "accuracy", "vqa_accuracy"):
        assert abs(means[8][key] - means[16][key]) < 1e-5, key


def test_evaluate_split_oov_breakdown(tiny_config, tmp_path,
                                      eight_cpu_devices):
    """In-/out-of-vocab accuracy split from the precomputed score table."""
    import jax

    from vqa_transfer_externaldata_tpu.data.datasets import load_dataset
    from vqa_transfer_externaldata_tpu.models.zoo import build_model
    from vqa_transfer_externaldata_tpu.parallel.evaler import evaluate_split
    from vqa_transfer_externaldata_tpu.parallel.trainer import Trainer

    cfg = tiny_config.replace_flat({"model.model": "vqa_baseline"})
    spec = build_model(cfg)
    ds = load_dataset(cfg, "val", stage="vqa")  # has answer_scores
    trainer = Trainer(cfg, spec, train_dir=str(tmp_path / "ev"))
    state = trainer.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    oov_ids = np.unique(ds.arrays["answer_id"])[:2]  # mark 2 answers OOV
    metrics, preds = evaluate_split(trainer, state, ds,
                                    oov_answer_ids=oov_ids)
    assert preds.shape[0] == len(ds)
    assert "vqa_accuracy_oov_answers" in metrics
    assert "vqa_accuracy_in_vocab_answers" in metrics
    # overall accuracy is a weighted mix of the two splits
    oov_mask = np.isin(ds.arrays["answer_id"], oov_ids)
    w = oov_mask.mean()
    mixed = (w * metrics["vqa_accuracy_oov_answers"]
             + (1 - w) * metrics["vqa_accuracy_in_vocab_answers"])
    assert abs(mixed - metrics["vqa_accuracy"]) < 1e-6
    trainer.close()


def test_label_less_split_predictions_only(tmp_path, eight_cpu_devices):
    """Predictions-only evaluation of a split with NO answer_id column:
    the evaluator must produce predictions + the official submission
    JSON (no loss metrics) instead of crashing. (The preprocessing
    tools' own test split carries an all-<unk> answer_id — weight 0,
    metric-safe by masking — so this covers user-constructed /
    serving-shaped tables that omit the column entirely.) Streaming and
    resident paths, identical predictions."""
    import json
    import os

    from vqa_transfer_externaldata_tpu.config import Config
    from vqa_transfer_externaldata_tpu.data.datasets import ArrayDataset
    from vqa_transfer_externaldata_tpu.models.zoo import build_model
    from vqa_transfer_externaldata_tpu.parallel.evaler import evaluate_split
    from vqa_transfer_externaldata_tpu.parallel.trainer import Trainer
    from vqa_transfer_externaldata_tpu.utils.vocab import Vocab

    cfg = Config().replace_flat({
        "data.synthetic": True, "data.vocab_size": 64,
        "data.num_answers": 16, "data.grid_h": 2, "data.grid_w": 2,
        "data.feature_dim": 16, "data.pool5_dim": 16,
        "data.max_question_len": 6,
        "model.model": "vqa_attention", "model.word_dim": 8,
        "model.rnn_dim": 8, "model.fusion_dim": 16, "model.att_hidden": 8,
        "model.answer_dim": 8, "model.dtype": "float32",
        "model.dropout": 0.0, "train.batch_size": 16,
        "train.warmup_steps": 1})
    rng = np.random.default_rng(0)
    n = 40  # n % batch != 0: padded tail too
    d = cfg.data
    arrays = {
        "q_ids": rng.integers(4, d.vocab_size, size=(n, d.max_question_len))
        .astype(np.int32),
        "features": rng.normal(size=(n, d.grid_h * d.grid_w, d.feature_dim))
        .astype(np.float32),
        "question_id": (1000 + np.arange(n)).astype(np.int64),
    }
    toks = (["<pad>", "<s>", "</s>", "<unk>"]
            + [f"ans{i}" for i in range(d.num_answers - 4)])
    answer_vocab = Vocab(toks, {t: i for i, t in enumerate(toks)})

    tr = Trainer(cfg, build_model(cfg), train_dir=str(tmp_path / "t"))
    state = tr.init_state({k: v[:1] for k, v in arrays.items()})

    ds = ArrayDataset(dict(arrays))
    out = str(tmp_path / "results_test.json")
    m, preds = evaluate_split(tr, state, ds, answer_vocab=answer_vocab,
                              results_path=out)
    assert preds.shape == (n,)
    assert "loss" not in m and "vqa_accuracy" not in m
    with open(out) as fh:
        results = json.load(fh)
    assert len(results) == n
    assert results[0]["question_id"] == 1000
    assert results[0]["answer"] in answer_vocab.tokens

    # resident path: identical predictions
    cfg_r = cfg.replace_flat({"train.device_data_cache": True})
    tr_r = Trainer(cfg_r, build_model(cfg_r), train_dir=str(tmp_path / "r"))
    state_r = tr_r.init_state({k: v[:1] for k, v in arrays.items()})
    state_r = state_r.replace(params=state.params)
    m_r, preds_r = evaluate_split(tr_r, state_r, ArrayDataset(dict(arrays)))
    np.testing.assert_array_equal(preds_r, preds)
    tr.close()
    tr_r.close()


def test_vlmap_eval_reports_loss_metrics(tmp_path, eight_cpu_devices):
    """Stage-1 (vlmap) eval batches carry 'label', not 'answer_id': the
    label-aware eval gate (ModelSpec.label_key) must still route them
    through the loss — regression for the predictions-only branch
    swallowing all stage-1 validation metrics."""
    from vqa_transfer_externaldata_tpu.config import Config
    from vqa_transfer_externaldata_tpu.data.datasets import load_dataset
    from vqa_transfer_externaldata_tpu.models.zoo import build_model
    from vqa_transfer_externaldata_tpu.parallel.evaler import padded_batches
    from vqa_transfer_externaldata_tpu.parallel.trainer import Trainer

    cfg = Config().replace_flat({
        "data.synthetic": True, "data.synthetic_size": 64,
        "data.vocab_size": 64, "data.pool5_dim": 16,
        "model.model": "vlmap", "model.word_dim": 8, "model.task_dim": 4,
        "model.num_tasks": 4, "model.num_candidates": 8,
        "model.dtype": "float32", "model.dropout": 0.0,
        "train.batch_size": 16, "train.warmup_steps": 1})
    spec = build_model(cfg)
    assert spec.label_key == "label"
    ds = load_dataset(cfg, "val", stage=spec.stage)
    tr = Trainer(cfg, spec, train_dir=str(tmp_path / "t"))
    state = tr.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    batches, _ = padded_batches(ds, cfg.train.batch_size)
    m, _ = tr.evaluate(state, batches)
    assert "loss" in m and "accuracy" in m and np.isfinite(m["loss"])
    m_res, _ = tr.evaluate_resident(state, ds)
    assert "loss" in m_res and np.isfinite(m_res["loss"])
    tr.close()
