"""Model registry (reference: ``--model`` string -> dynamic import of
``model_*`` files, SURVEY.md section 1 "Model zoo"). Here it is an explicit
registry mapping the model name in ``config.model.model`` to a builder, a
batch->inputs adapter, and a loss — one uniform surface so the shared
trainer/evaler work for every family (both stages)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from vqa_transfer_externaldata_tpu.config import Config
from vqa_transfer_externaldata_tpu.models.vlmap import (
    VLMapDescriptionModel, VLMapModel, vlmap_loss)
from vqa_transfer_externaldata_tpu.models.vqa_attention import (
    VQAAttentionModel, vqa_loss)
from vqa_transfer_externaldata_tpu.models.vqa_baseline import (
    VQABaselineModel, vqa_baseline_loss)
from vqa_transfer_externaldata_tpu.ops.layers import dtype_of


@dataclass(frozen=True)
class ModelSpec:
    """module: flax module; inputs: batch -> positional args for __call__;
    loss: (outputs, batch) -> (scalar, metrics dict)."""

    module: Any
    inputs: Callable[[Dict[str, jnp.ndarray]], Tuple]
    loss: Callable[[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]],
                   Tuple[jnp.ndarray, Dict]]
    # "vqa" (stage 2) or a stage-1 artifact prefix ("vlmap", "vlmap_desc")
    stage: str
    # Batch column the loss reads as its target. Eval paths use it to
    # decide between full metrics and the predictions-only pass (a split
    # without this column — e.g. a user-built server-submission table —
    # evaluates label-less instead of crashing in the loss).
    label_key: str = "answer_id"


def build_model(cfg: Config,
                word_init: Optional[np.ndarray] = None,
                answer_init: Optional[np.ndarray] = None) -> ModelSpec:
    m, d = cfg.model, cfg.data
    dt = dtype_of(m.dtype)
    name = m.model
    if m.dense_candidate_loss and not name.startswith("vlmap"):
        # point-of-use contract (mirrors the store_quantize gate): the
        # flag only means something for the stage-1 candidate CE.
        raise ValueError(
            f"model.dense_candidate_loss is a vlmap-family training-loss "
            f"option; it does nothing for model.model={name!r}")
    if name in ("vqa_attention", "vqa_attention2"):
        glimpses = 2 if name == "vqa_attention2" else max(1, m.glimpses)
        rnn_variant, use_pallas = m.rnn_variant, m.use_pallas
        if m.fidelity_mode:
            # Reference-convention assembly: TF1-exact GRU + f32 + XLA
            # attention; full forward pinned to the numpy oracle
            # (utils/fidelity.reference_forward_numpy, tests/test_fidelity).
            dt, rnn_variant, use_pallas, glimpses = (
                jnp.float32, "tf", False, 1)
        module = VQAAttentionModel(
            vocab_size=d.vocab_size, num_answers=d.num_answers,
            word_dim=m.word_dim, rnn_dim=m.rnn_dim,
            fusion_dim=m.fusion_dim, att_hidden=m.att_hidden,
            answer_dim=m.answer_dim, dropout=m.dropout, dtype=dt,
            use_pallas=use_pallas, glimpses=glimpses,
            rnn_variant=rnn_variant,
            n_cells=d.grid_h * d.grid_w,
            word_init=word_init, answer_init=answer_init)
        return ModelSpec(module,
                         lambda b: (b["features"], b["q_ids"]),
                         vqa_loss, "vqa")
    if name == "vqa_baseline":
        module = VQABaselineModel(
            vocab_size=d.vocab_size, num_answers=d.num_answers,
            word_dim=m.word_dim, fusion_dim=m.fusion_dim,
            dropout=m.dropout, dtype=dt, word_init=word_init)
        return ModelSpec(module,
                         lambda b: (b["pool5"], b["q_ids"]),
                         vqa_baseline_loss, "vqa")
    if name == "vlmap":
        module = VLMapModel(
            vocab_size=d.vocab_size, num_tasks=m.num_tasks,
            feature_dim=d.pool5_dim, word_dim=m.word_dim,
            task_dim=m.task_dim, dropout=m.dropout, dtype=dt,
            dense_loss=m.dense_candidate_loss, word_init=word_init)
        return ModelSpec(module,
                         lambda b: (b["feature"], b["task"], b["candidates"]),
                         vlmap_loss, "vlmap", label_key="label")
    if name == "vlmap_description":
        module = VLMapDescriptionModel(
            vocab_size=d.vocab_size, num_tasks=m.num_tasks,
            feature_dim=d.pool5_dim, word_dim=m.word_dim,
            rnn_dim=m.rnn_dim, task_dim=m.task_dim, dropout=m.dropout,
            dtype=dt, use_pallas=m.use_pallas,
            bidirectional=m.bidirectional_desc,
            dense_loss=m.dense_candidate_loss, word_init=word_init)
        return ModelSpec(module,
                         lambda b: (b["feature"], b["desc_ids"], b["task"],
                                    b["candidates"]),
                         vlmap_loss, "vlmap_desc", label_key="label")
    if name == "vqa_end2end":
        # Raw-image path (BASELINE config 5): built lazily to keep the
        # ResNet import out of the common path.
        from vqa_transfer_externaldata_tpu.models.end2end import (
            VQAEnd2EndModel, end2end_loss)

        module = VQAEnd2EndModel(
            vocab_size=d.vocab_size, num_answers=d.num_answers,
            word_dim=m.word_dim, rnn_dim=m.rnn_dim,
            fusion_dim=m.fusion_dim, att_hidden=m.att_hidden,
            answer_dim=m.answer_dim, dropout=m.dropout, dtype=dt,
            use_pallas=m.use_pallas, image_size=d.image_size,
            stage_sizes=resnet_stage_sizes(cfg), width=m.resnet_width,
            word_init=word_init, answer_init=answer_init)
        return ModelSpec(module,
                         lambda b: (b["images"], b["q_ids"]),
                         end2end_loss, "vqa")
    raise KeyError(f"unknown model {name!r}; known: {sorted(MODELS)}")


def resnet_stage_sizes(cfg: Config) -> Tuple[int, ...]:
    return tuple(int(s) for s in cfg.model.resnet_stages.split(","))


def example_batch(cfg: Config, batch_size: int = 1) -> Dict[str, np.ndarray]:
    """Zero-valued batch with the model family's exact input shapes — used
    wherever a structure-only init is needed (serving's non-trainable
    collection materialization, compile checks) without touching data."""
    d, m = cfg.data, cfg.model
    n = batch_size
    b: Dict[str, np.ndarray] = {
        "q_ids": np.zeros((n, d.max_question_len), np.int32),
        "answer_id": np.zeros((n,), np.int32),
    }
    name = m.model
    if name == "vqa_end2end":
        b["images"] = np.zeros((n, d.image_size, d.image_size, 3), np.uint8)
    elif name == "vqa_baseline":
        b["pool5"] = np.zeros((n, d.pool5_dim), np.float32)
    elif name.startswith("vlmap"):
        b["feature"] = np.zeros((n, d.pool5_dim), np.float32)
        b["task"] = np.zeros((n,), np.int32)
        b["candidates"] = np.zeros((n, m.num_candidates), np.int32)
        b["label"] = np.zeros((n,), np.int32)
        if name == "vlmap_description":
            b["desc_ids"] = np.zeros((n, d.max_question_len), np.int32)
    else:
        b["features"] = np.zeros((n, d.grid_h * d.grid_w, d.feature_dim),
                                 np.float32)
    return b


MODELS = ("vqa_attention", "vqa_attention2", "vqa_baseline", "vlmap",
          "vlmap_description", "vqa_end2end")
