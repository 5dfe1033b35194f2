"""Offline data tools: VQA v2 + Visual Genome preprocessing, feature
extraction, and the lazy feature join (reference C1/C2/C4 rebuild)."""

import json
import os

import numpy as np
import pytest

from vqa_transfer_externaldata_tpu.cli.preprocess import main as preprocess
from vqa_transfer_externaldata_tpu.utils.vocab import UNK_ID, Vocab


@pytest.fixture()
def vqa_json(tmp_path):
    """Official-schema fixture: 8 questions over 3 images."""
    questions = {"questions": [
        {"question_id": 10 * i, "image_id": 100 + i % 3,
         "question": q}
        for i, q in enumerate([
            "What color is the cat?", "Is the dog sleeping?",
            "How many cats are there?", "What color is the dog?",
            "Is the cat black?", "What is the dog doing?",
            "What color is the wall?", "How many dogs are there?"])]}
    answer_types = ["other", "yes/no", "number", "other", "yes/no",
                    "other", "other", "number"]
    question_types = ["what color is the", "is the", "how many",
                      "what color is the", "is the", "what is the",
                      "what color is the", "how many"]
    annotations = {"annotations": [
        {"question_id": 10 * i, "image_id": 100 + i % 3,
         "multiple_choice_answer": mca,
         "question_type": question_types[i],
         "answer_type": answer_types[i],
         "answers": [{"answer": mca}] * 8 + [{"answer": "maybe"}] * 2}
        for i, mca in enumerate(
            ["black", "yes", "two", "brown", "no", "sleeping",
             "white", "one"])]}
    qp = tmp_path / "questions.json"
    ap = tmp_path / "annotations.json"
    qp.write_text(json.dumps(questions))
    ap.write_text(json.dumps(annotations))
    return str(qp), str(ap)


def test_vqa_v2_preprocess(vqa_json, tmp_path):
    qp, ap = vqa_json
    out = str(tmp_path / "out")
    preprocess(["vqa_v2", "--out_dir", out,
                "--train_questions", qp, "--train_annotations", ap,
                "--val_questions", qp, "--val_annotations", ap,
                "--top_k", "4", "--max_question_len", "8",
                "--vocab_pad_to", "64"])
    vocab = Vocab.load(os.path.join(out, "vocab.json"))
    answers = Vocab.load(os.path.join(out, "answer_vocab.json"))
    assert "cat" in vocab.token_to_id and "color" in vocab.token_to_id
    assert len(answers) == 4 + 4  # top_k + specials

    train = np.load(os.path.join(out, "vqa_train.npz"))
    assert train["q_ids"].shape == (8, 8)
    assert train["question_id"].tolist() == list(range(0, 80, 10))
    # number words normalize to digits; 4 of 8 answers fall out of the
    # top-4 vocab (all count 1 -> lexicographic tie-break: 1, 2, black,
    # brown survive)
    in_vocab = train["answer_id"] != UNK_ID
    assert in_vocab.sum() == 4

    val = np.load(os.path.join(out, "vqa_val.npz"))
    assert "answer_scores" in val.files
    # 8/10 annotators agree -> in-vocab rows score 1.0 at their answer id
    row = val["answer_scores"][0]
    assert row.max() == 1.0

    # Question/answer type tables + per-row ids (the standard
    # yes/no-number-other breakdown every VQA paper tables).
    types = json.load(open(os.path.join(out, "types.json")))
    assert types["answer_types"] == ["<unk>", "number", "other", "yes/no"]
    assert "how many" in types["question_types"]
    at = val["answer_type_id"]
    names = types["answer_types"]
    assert [names[i] for i in at[:3]] == ["other", "yes/no", "number"]
    qt = val["question_type_id"]
    qnames = types["question_types"]
    assert qnames[qt[2]] == "how many"


def test_vg_task_discovery_and_artifacts(tmp_path):
    regions_json = [{"id": 1, "regions": [
        {"region_id": i, "image_id": 1, "phrase": p,
         "x": 0, "y": 0, "width": 10, "height": 10}
        for i, p in enumerate([
            "a black cat on the mat", "the white dog", "a red car",
            "black dog running", "a white cat sleeping", "the blue car",
        ])]}]
    rp = tmp_path / "regions.json"
    rp.write_text(json.dumps(regions_json))
    vocab = Vocab.build(["black cat white dog red car blue mat running "
                         "sleeping"])
    vp = tmp_path / "vocab.json"
    vocab.save(str(vp))
    out = str(tmp_path / "vg")
    preprocess(["visualgenome", "--out_dir", out,
                "--region_descriptions", str(rp), "--vocab", str(vp),
                "--num_tasks", "3", "--num_candidates", "4",
                "--min_word_count", "1"])
    train = np.load(os.path.join(out, "vlmap_train.npz"))
    meta = json.load(open(os.path.join(out, "vlmap_meta.json")))
    assert meta["num_words"] > 0
    n, K = train["candidates"].shape
    assert K == 4
    # planted positive: candidates[label] == word
    np.testing.assert_array_equal(
        train["candidates"][np.arange(n), train["label"]], train["word"])
    assert train["task"].max() < 3


def test_wordnet_task_discovery_branch(monkeypatch):
    """The WordNet grouping path (visualgenome.py:144-158) via a mocked
    lexname oracle — this box has no WordNet corpus, so only the mock can
    exercise grouping, small-group merge, and the num_tasks cap."""
    from vqa_transfer_externaldata_tpu.data import visualgenome as vg

    lexmap = {
        # 8 animals (>= min_task_size) -> its own task
        "cat": "noun.animal", "dog": "noun.animal", "bird": "noun.animal",
        "horse": "noun.animal", "cow": "noun.animal", "fish": "noun.animal",
        "sheep": "noun.animal", "goat": "noun.animal",
        # 8 artifacts -> its own task
        "car": "noun.artifact", "bus": "noun.artifact",
        "train": "noun.artifact", "boat": "noun.artifact",
        "chair": "noun.artifact", "table": "noun.artifact",
        "lamp": "noun.artifact", "door": "noun.artifact",
        # 2 colors: below min_task_size -> merged into misc (task 0)
        "red": "adj.all", "blue": "adj.all",
        # unknown word -> None -> misc
        "zzyzx": None,
    }
    monkeypatch.setattr(vg, "_wordnet_lexname", lambda w: lexmap.get(w))
    words = list(lexmap)
    word_to_task, task_names = vg.discover_tasks(words, num_tasks=8,
                                                 min_task_size=8)
    assert task_names[0] == "misc"
    assert set(task_names) == {"misc", "noun.animal", "noun.artifact"}
    animal = task_names.index("noun.animal")
    artifact = task_names.index("noun.artifact")
    assert {word_to_task[w] for w in
            ("cat", "dog", "bird", "horse")} == {animal}
    assert {word_to_task[w] for w in ("car", "bus", "lamp")} == {artifact}
    # small adj.all group and the lexname-less word both land in misc
    assert word_to_task["red"] == word_to_task["blue"] == 0
    assert word_to_task["zzyzx"] == 0

    # num_tasks cap: only the largest groups become tasks
    word_to_task2, task_names2 = vg.discover_tasks(words, num_tasks=2,
                                                   min_task_size=8)
    assert len(task_names2) == 2 and task_names2[0] == "misc"
    # the group that lost its slot merges into misc
    dropped = ({"noun.animal", "noun.artifact"} - set(task_names2)).pop()
    lost = [w for w in words if lexmap[w] == dropped]
    assert {word_to_task2[w] for w in lost} == {0}


def test_extract_and_joined_dataset(tmp_path):
    from PIL import Image

    from vqa_transfer_externaldata_tpu.data.features import (
        FeatureStore, JoinedDataset, extract_features)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    paths, ids = [], []
    for i in range(3):
        p = str(img_dir / f"COCO_test_{100 + i:012d}.jpg")
        Image.fromarray(
            np.full((40, 50, 3), 40 * i, np.uint8)).save(p)
        paths.append(p)
        ids.append(100 + i)

    out = str(tmp_path / "feat.hdf5")
    extract_features(paths, ids, out, batch_size=2, image_size=64)
    store = FeatureStore(out)
    assert store.grid.shape == (3, 2, 2, 2048)
    assert store.index_of[101] == 1

    arrays = {
        "q_ids": np.zeros((5, 4), np.int32),
        "answer_id": np.full((5,), 4, np.int32),
        "image_index": np.array([0, 1, 2, 0, 1], np.int32),
    }
    ds = JoinedDataset(arrays, store)
    batch = next(ds.batches(4, shuffle=False, epochs=1))
    assert batch["features"].shape == (4, 4, 2048)
    assert batch["pool5"].shape == (4, 2048)
    # joined rows match direct gathers
    direct = store.gather(arrays["image_index"][:4])
    np.testing.assert_allclose(batch["features"], direct["features"])
    store.close()


def test_real_artifact_training_path(vqa_json, tmp_path):
    """Full non-synthetic pipeline: preprocess -> extract -> train -> eval,
    with the lazy feature join (the path real VQA v2 data takes)."""
    from PIL import Image

    from vqa_transfer_externaldata_tpu.cli.train import main as train_main
    from vqa_transfer_externaldata_tpu.data.features import extract_features
    from vqa_transfer_externaldata_tpu.data.vqa_v2 import preprocess_vqa_v2

    qp, ap = vqa_json
    out = str(tmp_path / "pre")
    # feature store rows for image ids 100..102 -> index 0..2
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    paths, ids = [], [100, 101, 102]
    for i in ids:
        p = str(img_dir / f"img_{i}.jpg")
        Image.fromarray(np.full((32, 32, 3), i % 255, np.uint8)).save(p)
        paths.append(p)
    feat_path = str(tmp_path / "feat.hdf5")
    extract_features(paths, ids, feat_path, batch_size=2, image_size=64)

    preprocess_vqa_v2(out, qp, ap, val_questions=qp, val_annotations=ap,
                      top_k_answers=8, max_question_len=8, vocab_pad_to=64,
                      image_id_to_index={100: 0, 101: 1, 102: 2})

    train_dir = train_main([
        "--data.dataset_dir", out, "--data.feature_path", feat_path,
        "--data.vocab_path", os.path.join(out, "vocab.json"),
        "--data.answer_vocab_path", os.path.join(out, "answer_vocab.json"),
        "--data.vocab_size", "64", "--data.num_answers", "12",
        "--data.grid_h", "2", "--data.grid_w", "2",
        "--data.max_question_len", "8",
        "--model.model", "vqa_attention", "--model.word_dim", "8",
        "--model.rnn_dim", "8", "--model.fusion_dim", "16",
        "--model.att_hidden", "8", "--model.answer_dim", "8",
        "--model.dtype", "float32", "--model.dropout", "0.0",
        "--train.batch_size", "8", "--train.max_steps", "3",
        "--train.log_every", "1", "--train.eval_every", "2",
        "--train.checkpoint_every", "100",
        "--train.train_dir", str(tmp_path / "run")])
    assert os.path.exists(os.path.join(train_dir, "params_final"))

    # The eval CLI against the same feature-store-backed run: padded_batches
    # must route through JoinedDataset.take so batches carry features/pool5
    # (regression: reading ds.arrays directly crashed every real-data eval).
    from vqa_transfer_externaldata_tpu.cli.eval import main as eval_main

    # batch 16 over 8 rows: the single batch is tail-padded through take().
    metrics = eval_main(["--train.train_dir", train_dir,
                         "--train.batch_size", "16"])
    assert "vqa_accuracy" in metrics
    # per-type breakdown from types.json + answer_type_id/question_type_id
    assert "vqa_accuracy_answer_type/yes_no" in metrics
    assert "vqa_accuracy_answer_type/number" in metrics
    assert "vqa_accuracy_question_type/how_many" in metrics
    # weighted mix of the three type accuracies equals the overall number
    total = (2 * metrics["vqa_accuracy_answer_type/yes_no"]
             + 2 * metrics["vqa_accuracy_answer_type/number"]
             + 4 * metrics["vqa_accuracy_answer_type/other"]) / 8
    assert abs(total - metrics["vqa_accuracy"]) < 1e-6
    results_path = os.path.join(train_dir, "results_val.json")
    assert os.path.exists(results_path)
    with open(results_path) as fh:
        results = json.load(fh)
    assert len(results) == 8  # every val question answered, none padded
    assert {"question_id", "answer"} <= set(results[0])


def test_int8_store_through_train_and_eval_cli(vqa_json, tmp_path):
    """--train.store_quantize int8 end-to-end at CLI level: training runs
    the quantized resident fused path, the flag persists in the saved
    config, and the eval CLI (which adopts the saved config) evaluates
    through the same quantized store."""
    from PIL import Image

    from vqa_transfer_externaldata_tpu.cli.eval import main as eval_main
    from vqa_transfer_externaldata_tpu.cli.train import main as train_main
    from vqa_transfer_externaldata_tpu.data.features import extract_features
    from vqa_transfer_externaldata_tpu.data.vqa_v2 import preprocess_vqa_v2

    qp, ap = vqa_json
    out = str(tmp_path / "pre")
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    paths, ids = [], [100, 101, 102]
    for i in ids:
        p = str(img_dir / f"img_{i}.jpg")
        Image.fromarray(np.full((32, 32, 3), i % 255, np.uint8)).save(p)
        paths.append(p)
    feat_path = str(tmp_path / "feat.hdf5")
    extract_features(paths, ids, feat_path, batch_size=2, image_size=64)
    preprocess_vqa_v2(out, qp, ap, val_questions=qp, val_annotations=ap,
                      top_k_answers=8, max_question_len=8, vocab_pad_to=64,
                      image_id_to_index={100: 0, 101: 1, 102: 2})

    train_dir = train_main([
        "--data.dataset_dir", out, "--data.feature_path", feat_path,
        "--data.vocab_path", os.path.join(out, "vocab.json"),
        "--data.answer_vocab_path", os.path.join(out, "answer_vocab.json"),
        "--data.vocab_size", "64", "--data.num_answers", "12",
        "--data.grid_h", "2", "--data.grid_w", "2",
        "--data.max_question_len", "8",
        "--model.model", "vqa_attention", "--model.word_dim", "8",
        "--model.rnn_dim", "8", "--model.fusion_dim", "16",
        "--model.att_hidden", "8", "--model.answer_dim", "8",
        "--model.dtype", "float32", "--model.dropout", "0.0",
        "--train.device_data_cache", "true",
        "--train.resident_fused_attention", "true",
        "--train.store_quantize", "int8",
        "--train.batch_size", "8", "--train.max_steps", "3",
        "--train.log_every", "1", "--train.eval_every", "10000",
        "--train.checkpoint_every", "100",
        "--train.train_dir", str(tmp_path / "run_int8")])
    assert os.path.exists(os.path.join(train_dir, "params_final"))
    with open(os.path.join(train_dir, "config.json")) as fh:
        assert json.load(fh)["train"]["store_quantize"] == "int8"

    metrics = eval_main(["--train.train_dir", train_dir])
    assert "vqa_accuracy" in metrics and np.isfinite(metrics["loss"])


def test_candidate_resampler(tmp_path):
    from vqa_transfer_externaldata_tpu.data.datasets import ArrayDataset
    from vqa_transfer_externaldata_tpu.data.visualgenome import (
        CandidateResampler)

    n, K = 32, 6
    rng = np.random.default_rng(0)
    task = rng.integers(0, 2, size=n).astype(np.int32)
    pools = {0: [10, 11, 12, 13], 1: [20, 21, 22, 23]}
    word = np.asarray([pools[int(t)][i % 4] for i, t in enumerate(task)],
                      np.int32)
    base = ArrayDataset({"task": task, "word": word,
                         "feature": np.zeros((n, 4), np.float32)})
    ds = CandidateResampler(base, pools, num_candidates=K, seed=1)
    b1 = next(ds.batches(16, seed=0, epochs=1, shuffle=False))
    # positive planted at label
    np.testing.assert_array_equal(
        b1["candidates"][np.arange(16), b1["label"]], b1["word"])
    # candidates drawn from the row's own task pool
    for i in range(16):
        pool = set(pools[int(b1["task"][i])]) | {int(b1["word"][i])}
        assert set(b1["candidates"][i].tolist()) <= pool
    # fresh negatives across epochs within one stream (same rows, new
    # candidate draws); a new identically-seeded stream is deterministic
    it = ds.batches(16, seed=0, epochs=2, shuffle=False)
    e0 = next(it)
    next(it)  # second batch of epoch 0
    e1 = next(it)  # same rows as e0, epoch 1
    np.testing.assert_array_equal(e0["word"], e1["word"])
    assert not np.array_equal(e0["candidates"], e1["candidates"])
    it2 = ds.batches(16, seed=0, epochs=1, shuffle=False)
    np.testing.assert_array_equal(e0["candidates"],
                                  next(it2)["candidates"])


def test_candidate_resampler_rejects_unknown_task(tmp_path):
    """A batch task with no candidate pool (stale/mismatched
    vlmap_meta.json) must fail loudly — np.empty rows would otherwise
    train on uninitialized garbage as negatives."""
    from vqa_transfer_externaldata_tpu.data.datasets import ArrayDataset
    from vqa_transfer_externaldata_tpu.data.visualgenome import (
        CandidateResampler)

    n = 16
    base = ArrayDataset({
        "task": np.full((n,), 7, np.int32),  # task 7 not in pools
        "word": np.full((n,), 10, np.int32),
        "feature": np.zeros((n, 4), np.float32)})
    ds = CandidateResampler(base, {0: [10, 11, 12, 13]}, num_candidates=4)
    with pytest.raises(ValueError, match="no candidate pool"):
        next(ds.batches(8, seed=0, epochs=1, shuffle=False))


def test_answer_holdout_oov_protocol(vqa_json, tmp_path):
    """Paper's OOV protocol: held-out answers become <unk> in training
    targets (masked from the loss) but keep their eval score rows."""
    from vqa_transfer_externaldata_tpu.data.vqa_v2 import preprocess_vqa_v2

    qp, ap = vqa_json
    out = str(tmp_path / "out")
    preprocess_vqa_v2(out, qp, ap, val_questions=qp, val_annotations=ap,
                      top_k_answers=8, max_question_len=8,
                      answer_holdout_fraction=0.5, holdout_seed=0)
    oov = json.load(open(os.path.join(out, "oov_split.json")))["oov_ids"]
    assert len(oov) == 4  # half of 8 answers
    train = np.load(os.path.join(out, "vqa_train.npz"))
    val = np.load(os.path.join(out, "vqa_val.npz"))
    # training rows whose (val-visible) answer is held out were masked
    held_rows = np.isin(val["answer_id"], oov)
    assert held_rows.any()
    assert np.all(train["answer_id"][held_rows] == UNK_ID)
    # eval scores untouched: held-out answers still scoreable
    assert val["answer_scores"][held_rows].max() == 1.0


def test_glove_cli(tmp_path):
    vocab = Vocab.build(["cat dog"])
    vp = tmp_path / "vocab.json"
    vocab.save(str(vp))
    gt = tmp_path / "glove.txt"
    gt.write_text("cat " + " ".join(["1.5"] * 8) + "\n")
    out = str(tmp_path / "emb.npz")
    preprocess(["glove", "--out", out, "--glove_txt", str(gt),
                "--vocab", str(vp), "--dim", "8", "--pad_to", "16"])
    mat = np.load(out)["embedding"]
    assert mat.shape == (16, 8)
    assert np.all(mat[vocab.token_to_id["cat"]] == 1.5)


def test_region_feature_extraction_glue(tmp_path):
    """VG regions -> region_meta.npz -> cli.extract --regions crop store ->
    stage-1 training joins it by region_index (VERDICT Missing #4)."""
    from PIL import Image

    from vqa_transfer_externaldata_tpu.cli.extract import main as extract_main
    from vqa_transfer_externaldata_tpu.cli.train import main as train_main
    from vqa_transfer_externaldata_tpu.data.features import FeatureStore

    regions_json = [
        {"id": img, "regions": [
            {"region_id": 10 * img + k, "image_id": img,
             "phrase": p, "x": 2 * k, "y": 3, "width": 8, "height": 6}
            for k, p in enumerate(phrases)]}
        for img, phrases in ((1, ["a black cat", "the white dog",
                                  "black dog running", "a white cat"]),
                             (2, ["a red car", "the blue car",
                                  "white car parked", "a black car"]))]
    rp = tmp_path / "regions.json"
    rp.write_text(json.dumps(regions_json))
    vocab = Vocab.build(["black cat white dog red car blue running parked"])
    vp = tmp_path / "vocab.json"
    vocab.save(str(vp))
    out = str(tmp_path / "vg")
    preprocess(["visualgenome", "--out_dir", out,
                "--region_descriptions", str(rp), "--vocab", str(vp),
                "--num_tasks", "2", "--num_candidates", "4",
                "--min_word_count", "1"])
    meta_path = os.path.join(out, "region_meta.npz")
    meta = np.load(meta_path)
    assert meta["image_id"].shape[0] == 8  # one row per region
    assert meta["bbox"].shape == (8, 4)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for img in (1, 2):
        Image.fromarray(np.full((30, 40, 3), 100 * img, np.uint8)).save(
            str(img_dir / f"{img}.jpg"))
    feat_path = str(tmp_path / "region_feats.hdf5")
    extract_main(["--image_dir", str(img_dir), "--out", feat_path,
                  "--regions", meta_path, "--batch_size", "4",
                  "--image_size", "64"])
    store = FeatureStore(feat_path)
    assert store.grid.shape[0] == 8  # row r = region_index r
    np.testing.assert_array_equal(store.image_ids, np.arange(8))
    store.close()

    train_dir = train_main([
        "--data.dataset_dir", out, "--data.feature_path", feat_path,
        "--data.vocab_path", str(vp),
        "--data.vocab_size", "64", "--data.pool5_dim", "2048",
        "--model.model", "vlmap", "--model.word_dim", "8",
        "--model.task_dim", "4", "--model.num_tasks", "2",
        "--model.num_candidates", "4", "--model.dtype", "float32",
        "--model.dropout", "0.0",
        "--train.batch_size", "8", "--train.max_steps", "2",
        "--train.log_every", "1", "--train.eval_every", "10000",
        "--train.checkpoint_every", "100",
        "--train.train_dir", str(tmp_path / "vl_run")])
    assert os.path.exists(os.path.join(train_dir, "params_final"))


def test_description_artifacts_and_pattern_discovery(tmp_path):
    """Blank-fill artifacts: blank planted as <unk>, positive among
    same-task candidates, and positional pattern discovery (object /
    attribute / relationship blanks)."""
    from vqa_transfer_externaldata_tpu.data.visualgenome import (
        PATTERN_NAMES, build_vlmap_description_artifacts,
        classify_blank_pattern)

    visual = frozenset({"black", "cat", "dog", "car", "white"})
    assert classify_blank_pattern(["a", "black", "cat"], 1, visual) == 1
    assert classify_blank_pattern(["a", "black", "cat"], 2, visual) == 0
    assert classify_blank_pattern(["dog", "on", "the", "car"], 0,
                                  visual) == 2
    assert classify_blank_pattern(["dog", "on", "the", "car"], 3,
                                  visual) == 0
    assert PATTERN_NAMES == ("object", "attribute", "relationship")

    regions = [{"image_id": 1, "region_id": i, "phrase": p,
                "x": 0, "y": 0, "width": 4, "height": 4}
               for i, p in enumerate(
                   ["a black cat", "dog on the car", "white dog",
                    "the white car", "black dog", "a white cat"])]
    vocab = Vocab.build(["black cat white dog car on"])
    out = str(tmp_path / "vgd")
    arts = build_vlmap_description_artifacts(
        regions, vocab, num_tasks=2, num_candidates=4, min_word_count=1,
        max_desc_len=6, out_dir=out, val_fraction=0.2)
    assert os.path.exists(os.path.join(out, "vlmap_desc_train.npz"))
    meta = json.load(open(os.path.join(out, "vlmap_desc_meta.json")))
    assert set(meta["pattern_counts"]) == set(PATTERN_NAMES)
    tr = arts["train"]
    n = tr["label"].shape[0]
    # positive planted at label
    np.testing.assert_array_equal(
        tr["candidates"][np.arange(n), tr["label"]], tr["word"])
    # the blank position holds <unk> in every description
    np.testing.assert_array_equal(
        tr["desc_ids"][np.arange(n), tr["blank_pos"]],
        np.ones(n, np.int32) * UNK_ID)
    assert tr["desc_ids"].shape[1] == 6


def test_preprocess_val_requires_annotations(vqa_json, tmp_path):
    from vqa_transfer_externaldata_tpu.data.vqa_v2 import preprocess_vqa_v2

    qp, ap = vqa_json
    with pytest.raises(ValueError, match="val_annotations"):
        preprocess_vqa_v2(str(tmp_path / "pre"), qp, ap, val_questions=qp)
