"""Test environment: fake 8-device CPU mesh (SURVEY.md section 4).

Must run before the first ``import jax`` anywhere in the test process: tests
validate multi-chip sharding on 8 virtual CPU devices, the TPU-world
equivalent of a fake backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize forces jax_platforms="axon,cpu"
# programmatically (overriding the env var); force pure-CPU back before any
# backend initializes so tests run on the fake 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache across suite runs: CPU compiles
# dominate this suite's wall time on a throttled box (A/B on
# test_models.py: 30.4 s cold -> 22.9 s warm, 25% faster; cache keys
# cover program + flags, so staleness is jax's contract not ours). Set
# via the runtime config API — the sitecustomize imports jax before
# this file runs, so the env var would be read too early.
if os.environ.get("JAX_COMPILATION_CACHE_DIR") is None:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".pytest_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_cpu_devices():
    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 fake CPU devices, got {devices}"
    return devices


@pytest.fixture()
def tiny_config():
    """Small-dimension Config for fast CPU train-loop tests."""
    from vqa_transfer_externaldata_tpu.config import Config

    return Config().replace_flat({
        "data.synthetic": True, "data.synthetic_size": 256,
        "data.vocab_size": 128, "data.num_answers": 32,
        "data.grid_h": 4, "data.grid_w": 4, "data.feature_dim": 32,
        "data.pool5_dim": 32, "data.max_question_len": 8,
        "model.word_dim": 16, "model.rnn_dim": 16, "model.fusion_dim": 32,
        "model.att_hidden": 16, "model.answer_dim": 16,
        "model.dtype": "float32", "model.num_tasks": 4,
        "model.task_dim": 8, "model.num_candidates": 16,
        "model.dropout": 0.1,
        "train.batch_size": 32, "train.max_steps": 40,
        "train.log_every": 10, "train.eval_every": 10_000,
        "train.checkpoint_every": 20, "train.warmup_steps": 1,
        "train.learning_rate": 3e-3,
    })
