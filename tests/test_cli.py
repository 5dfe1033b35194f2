"""End-to-end CLI flows: both stages + transfer + eval (reference 3.1-3.3)."""

import json
import os

import pytest

from vqa_transfer_externaldata_tpu.cli import eval as eval_cli
from vqa_transfer_externaldata_tpu.cli import train as train_cli

TINY = [
    "--data.synthetic", "true", "--data.synthetic_size", "128",
    "--data.vocab_size", "64", "--data.num_answers", "16",
    "--data.grid_h", "2", "--data.grid_w", "2",
    "--data.feature_dim", "16", "--data.pool5_dim", "16",
    "--data.max_question_len", "6",
    "--model.word_dim", "8", "--model.rnn_dim", "8",
    "--model.fusion_dim", "16", "--model.att_hidden", "8",
    "--model.answer_dim", "8", "--model.dtype", "float32",
    "--model.num_tasks", "4", "--model.task_dim", "4",
    "--model.num_candidates", "8", "--model.dropout", "0.0",
    "--train.batch_size", "16", "--train.max_steps", "8",
    "--train.log_every", "4", "--train.eval_every", "10000",
    "--train.checkpoint_every", "4", "--train.warmup_steps", "1",
]


def test_full_two_stage_pipeline(tmp_path):
    # Stage 1: vlmap pretraining
    vlmap_dir = train_cli.main(TINY + [
        "--model.model", "vlmap",
        "--train.train_dir", str(tmp_path / "vlmap_run")])
    assert os.path.exists(os.path.join(vlmap_dir, "params_final"))
    assert os.path.exists(os.path.join(vlmap_dir, "config.json"))

    # Stage 2: vqa with transfer init from stage 1
    vqa_dir = train_cli.main(TINY + [
        "--model.model", "vqa_attention",
        "--train.train_dir", str(tmp_path / "vqa_run"),
        "--train.pretrained_param_path",
        os.path.join(vlmap_dir, "params_final")])
    assert os.path.exists(os.path.join(vqa_dir, "params_final"))

    # Eval: metrics + official-format results JSON
    metrics = eval_cli.main([
        "--train.train_dir", vqa_dir, "--eval_split", "val"])
    assert "vqa_accuracy" in metrics
    results_path = os.path.join(vqa_dir, "results_val.json")
    with open(results_path) as fh:
        results = json.load(fh)
    assert len(results) == 128  # every val question answered
    assert set(results[0]) == {"question_id", "answer"}


def test_profile_flag_writes_trace(tmp_path):
    d = str(tmp_path / "prof_run")
    train_cli.main(TINY + ["--model.model", "vqa_baseline",
                           "--train.train_dir", d,
                           "--train.max_steps", "6",
                           "--train.profile_start", "2",
                           "--train.profile_steps", "2"])
    import glob

    traces = glob.glob(os.path.join(d, "profile", "**", "*.json.gz"),
                       recursive=True)
    assert traces, "profiler trace not written"


def test_profile_start_between_dispatch_boundaries_still_traces(tmp_path):
    """steps_per_call > 1: the loop visits steps 0, 4, 8, ... — a
    profile_start of 2 is never hit exactly; the >= start condition must
    begin the trace at the next boundary instead of skipping it (and
    then crashing in stop_trace with no active trace)."""
    d = str(tmp_path / "prof_k4_run")
    train_cli.main(TINY + ["--model.model", "vqa_baseline",
                           "--train.train_dir", d,
                           "--train.max_steps", "12",
                           "--train.steps_per_call", "4",
                           "--train.profile_start", "2",
                           "--train.profile_steps", "5"])
    import glob

    traces = glob.glob(os.path.join(d, "profile", "**", "*.json.gz"),
                       recursive=True)
    assert traces, "profiler trace not written at k=4"


def test_profile_window_past_max_steps_still_writes_trace(tmp_path):
    """profile_start + profile_steps > max_steps: the stop boundary is
    never reached inside the loop — the trace must still be closed (and
    written) at training end instead of leaking unterminated."""
    d = str(tmp_path / "prof_trunc_run")
    train_cli.main(TINY + ["--model.model", "vqa_baseline",
                           "--train.train_dir", d,
                           "--train.max_steps", "4",
                           "--train.profile_start", "2",
                           "--train.profile_steps", "100"])
    import glob

    traces = glob.glob(os.path.join(d, "profile", "**", "*.json.gz"),
                       recursive=True)
    assert traces, "truncated profiler trace not written"


def test_eval_cli_adopts_saved_config_with_overrides(tmp_path):
    d = train_cli.main(TINY + ["--model.model", "vqa_baseline",
                               "--train.train_dir",
                               str(tmp_path / "cfg_run")])
    # eval passes ONLY the train_dir: model/dims must come from config.json
    metrics = eval_cli.main(["--train.train_dir", d])
    assert "loss" in metrics
    # an explicit flag must override the saved value (smaller eval batch)
    metrics2 = eval_cli.main(["--train.train_dir", d,
                              "--train.batch_size", "8"])
    assert abs(metrics["loss"] - metrics2["loss"]) < 1e-3


def test_train_resume_via_cli(tmp_path):
    d = str(tmp_path / "resume_run")
    train_cli.main(TINY + ["--model.model", "vqa_baseline",
                           "--train.train_dir", d,
                           "--train.max_steps", "4"])
    # second invocation resumes at 4 and continues to 8
    train_cli.main(TINY + ["--model.model", "vqa_baseline",
                           "--train.train_dir", d,
                           "--train.max_steps", "8"])
    with open(os.path.join(d, "metrics.jsonl")) as fh:
        steps = [json.loads(l)["step"] for l in fh]
    assert max(steps) == 8


def test_description_variant_two_stage_pipeline(tmp_path):
    """Stage 1 with the description blank-fill variant -> transfer into
    stage 2 (reference C6's `_answer`-shaped variant; VERDICT Missing #2)."""
    vlmap_dir = train_cli.main(TINY + [
        "--model.model", "vlmap_description",
        "--train.train_dir", str(tmp_path / "vld_run")])
    assert os.path.exists(os.path.join(vlmap_dir, "params_final"))

    vqa_dir = train_cli.main(TINY + [
        "--model.model", "vqa_attention",
        "--train.train_dir", str(tmp_path / "vqa_run"),
        "--train.pretrained_param_path",
        os.path.join(vlmap_dir, "params_final")])
    assert os.path.exists(os.path.join(vqa_dir, "params_final"))


def test_eval_cli_resident_matches_streaming(tmp_path):
    """--train.device_data_cache routes eval through the device-resident
    full-split evaluator; metrics must match the streaming path."""
    d = train_cli.main(TINY + [
        "--model.model", "vqa_attention", "--model.dropout", "0.0",
        "--train.train_dir", str(tmp_path / "run")])
    m_stream = eval_cli.main(["--train.train_dir", d])
    m_res = eval_cli.main(["--train.train_dir", d,
                           "--train.device_data_cache", "true"])
    assert set(m_res) == set(m_stream)
    for k in m_stream:
        assert abs(m_res[k] - m_stream[k]) < 1e-4, (k, m_res[k], m_stream[k])


@pytest.mark.slow  # three end2end CLI trainings: ~2 min on the 1-CPU box
def test_end2end_grain_pipeline_exact_resume(tmp_path):
    """--data.input_pipeline grain (SURVEY section 7 step 7, round-2
    VERDICT item 5): the raw-JPEG end2end path trains through the grain
    pipeline, the iterator state is checkpointed alongside Orbax, and a
    mid-epoch resume continues on the EXACT next sample — params after
    4+2 resumed steps equal an uninterrupted 6-step run bitwise."""
    import numpy as np
    from PIL import Image

    from vqa_transfer_externaldata_tpu.data.ingest import coco_image_path

    rng = np.random.default_rng(0)
    n, n_img, T, size = 48, 8, 6, 64  # 64px / stride 32 = the 2x2 grid
    image_dir = tmp_path / "images"
    image_dir.mkdir()
    for i in range(n_img):
        Image.fromarray(rng.integers(0, 256, size=(size, size, 3))
                        .astype(np.uint8)).save(
            coco_image_path(str(image_dir), "train2014", i), quality=90)
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    np.savez(data_dir / "vqa_train.npz",
             q_ids=rng.integers(4, 64, size=(n, T)).astype(np.int32),
             answer_id=rng.integers(4, 16, size=n).astype(np.int32),
             image_index=rng.integers(0, n_img, size=n).astype(np.int32))
    np.save(data_dir / "image_ids.npy", np.arange(n_img, dtype=np.int64))

    base = [
        "--data.dataset_dir", str(data_dir),
        "--data.image_dir", str(image_dir),
        "--data.input_pipeline", "grain",
        "--data.image_size", str(size),
        "--data.vocab_size", "64", "--data.num_answers", "16",
        "--data.grid_h", "2", "--data.grid_w", "2",
        "--data.max_question_len", str(T),
        "--model.model", "vqa_end2end",
        "--model.resnet_stages", "1,1,1,1", "--model.resnet_width", "8",
        "--model.word_dim", "8", "--model.rnn_dim", "8",
        "--model.fusion_dim", "16", "--model.att_hidden", "8",
        "--model.answer_dim", "8", "--model.dtype", "float32",
        "--model.dropout", "0.0",
        "--train.batch_size", "8", "--train.log_every", "2",
        "--train.eval_every", "10000", "--train.checkpoint_every", "4",
        "--train.warmup_steps", "1",
    ]

    def final_params(train_dir):
        from vqa_transfer_externaldata_tpu.utils.checkpoint import (
            load_params)

        return load_params(os.path.join(train_dir, "params_final"))["params"]

    # Oracle: 6 uninterrupted steps.
    dir_a = train_cli.main(base + [
        "--train.max_steps", "6",
        "--train.train_dir", str(tmp_path / "uninterrupted")])

    # Interrupted: 4 steps, then resume to 6 in the same train_dir.
    dir_b = train_cli.main(base + [
        "--train.max_steps", "4",
        "--train.train_dir", str(tmp_path / "resumed")])
    assert os.path.exists(os.path.join(dir_b, "ckpt", "data_iter_4.json"))
    dir_b2 = train_cli.main(base + [
        "--train.max_steps", "6",
        "--train.train_dir", str(tmp_path / "resumed")])
    assert dir_b2 == dir_b

    import jax

    pa = final_params(dir_a)
    pb = final_params(dir_b)
    for (k, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(pa),
                              jax.tree_util.tree_leaves_with_path(pb)):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"{jax.tree_util.keystr(k)}: mid-epoch resume drifted "
                    f"off the uninterrupted data stream")


def test_joined_synthetic_layout_cli(tmp_path):
    """--data.synthetic_layout joined drives the PRODUCTION corpus layout
    (deduplicated store + image_index join) from the CLI: resident
    training takes the gather-free fused path and eval matches the
    streaming evaluator."""
    d = train_cli.main(TINY + [
        "--model.model", "vqa_attention",
        "--data.synthetic_layout", "joined",
        "--train.device_data_cache", "true",
        "--train.train_dir", str(tmp_path / "run")])
    assert os.path.exists(os.path.join(d, "params_final"))
    with open(os.path.join(d, "config.json")) as fh:
        assert json.load(fh)["data"]["synthetic_layout"] == "joined"
    m_res = eval_cli.main(["--train.train_dir", d])
    m_stream = eval_cli.main(["--train.train_dir", d,
                              "--train.device_data_cache", "false"])
    # joined val splits carry answer_scores like flat ones: the official
    # metric must be present, not silently dropped
    assert "vqa_accuracy" in m_res and "vqa_accuracy" in m_stream
    for k in m_stream:
        assert abs(m_res[k] - m_stream[k]) < 1e-3, (k, m_res, m_stream)
