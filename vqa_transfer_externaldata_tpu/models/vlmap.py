"""Stage-1 pretraining models (reference C6, ``model_vlmap`` family).

Task-conditional visual classifiers over Visual Genome region descriptions:
given a region's visual feature and a discovered task (visual-word group),
score candidate answer words by dot product in a word-embedding space that is
GloVe-initialized and trained jointly. After pretraining, the word-embedding
table (plus the visual projection) is what transfers into the stage-2 VQA
model's answer classifier (reference C12; SURVEY.md section 0).

Two variants, mirroring the reference's ``model_vlmap_*`` files:

- :class:`VLMapModel` — word-level: score candidate words from the region
  feature alone (FiLM task conditioning).
- :class:`VLMapDescriptionModel` — description-level blank fill: a GRU in
  the SAME word space encodes the region phrase with the target blanked
  out (data/visualgenome.build_vlmap_description_artifacts); the visual
  feature + description context + task jointly predict the blanked word.
  This is the ``_answer``-shaped variant whose weights transfer: it
  exposes the identical ``word_emb/embedding`` path, so
  utils/checkpoint.transfer_init consumes either variant unchanged.

Batch format: ``feature`` [B, C] region visual feature, ``task`` [B] int32
task id, ``candidates`` [B, K] int32 word ids (row 0..K-1, one positive),
``label`` [B] int32 index of the positive within candidates; the
description variant adds ``desc_ids`` [B, T] (blank = <unk>).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vqa_transfer_externaldata_tpu.ops.layers import MLP, l2_normalize
from vqa_transfer_externaldata_tpu.utils.vocab import PAD_ID


class VLMapModel(nn.Module):
    vocab_size: int
    num_tasks: int = 32
    feature_dim: int = 2048
    word_dim: int = 300
    task_dim: int = 64
    hidden_dim: int = 1024
    dropout: float = 0.5
    dtype: Any = jnp.bfloat16
    # Training emits dense [B, V] logits for the count-weighted CE
    # (model.dense_candidate_loss, config.py) instead of gathering the
    # [B, K] candidate columns; eval always gathers.
    dense_loss: bool = False
    word_init: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, feature: jnp.ndarray, task: jnp.ndarray,
                 candidates: jnp.ndarray, *,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype

        # Shared word-embedding space (the transferable artifact). Stored
        # under the same param path ("word_emb/embedding") as the VQA
        # models' table so transfer restore is a pure pytree-path mapping.
        word_emb = self._word_table()

        # Task conditioning: FiLM-style — the task embedding modulates the
        # visual projection input. (TPU-friendly: one gather + concat, no
        # per-task branches.)
        task_table = self.param("task_embedding",
                                nn.initializers.normal(0.02),
                                (self.num_tasks, self.task_dim), jnp.float32)
        t_emb = jnp.take(task_table, task, axis=0).astype(dt)
        f = feature.astype(dt)
        x = jnp.concatenate([f, t_emb], axis=-1)
        z = MLP([self.hidden_dim, self.word_dim], dropout=self.dropout,
                dtype=dt, name="visual_proj")(x, train=train)

        # Candidate scoring: scaled cosine similarity in the shared space.
        scale = self.param("logit_scale", nn.initializers.constant(10.0),
                           (), jnp.float32)
        proj = l2_normalize(z.astype(jnp.float32))
        if self.dense_loss and train:
            return {"logits_vocab": _score_vocab(z, word_emb, scale),
                    "projection": proj}
        logits = _score_candidates(z, word_emb, candidates, scale)
        return {"logits": logits, "projection": proj}

    def _word_table(self) -> jnp.ndarray:
        """Nested-scope param so the table lives at params/word_emb/embedding,
        mirroring WordEmbedding's path in the VQA models (transfer glue)."""
        if self.word_init is not None:
            winit = lambda *_: jnp.asarray(self.word_init, jnp.float32)
        else:
            winit = nn.initializers.normal(0.01)
        return _WordTable(self.vocab_size, self.word_dim, winit,
                          name="word_emb")()


class _WordTable(nn.Module):
    vocab_size: int
    dim: int
    init_fn: Any

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("embedding", self.init_fn,
                          (self.vocab_size, self.dim), jnp.float32)


def _score_vocab(z: jnp.ndarray, word_emb: jnp.ndarray,
                 scale: jnp.ndarray) -> jnp.ndarray:
    """Scaled cosine of projection ``z`` [B, D] against EVERY word row ->
    dense logits [B, V]. The dense-candidate-loss training path consumes
    this directly (no per-example gather; see ``vlmap_loss``)."""
    zn = l2_normalize(z.astype(jnp.float32))
    en = l2_normalize(word_emb.astype(jnp.float32))  # [V, D]
    scores = jnp.einsum("bd,vd->bv", zn, en,
                        preferred_element_type=jnp.float32)  # [B, V]
    return scores * scale


def _score_candidates(z: jnp.ndarray, word_emb: jnp.ndarray,
                      candidates: jnp.ndarray, scale: jnp.ndarray
                      ) -> jnp.ndarray:
    """Scaled cosine similarity of projection ``z`` [B, D] against the
    candidate rows [B, K] of the shared word table -> logits [B, K].

    TPU-first formulation: score the WHOLE vocab with one dense [B, D] x
    [D, V] matmul and take_along_axis the [B, K] candidate columns —
    identical values/gradients to gathering per-example candidate rows,
    but the [B, K, D] intermediate (157 MB/step at production shape, the
    old path's cost: gather + normalize + einsum + scatter-add backward,
    all HBM-bound) never exists. Profiled on v5e at B=256, K=512,
    V=8192: step 4.33 -> 2.42 ms. The full-vocab score matrix is only
    [B, V] f32 (8 MB); the remaining cost is the [B, K]-from-[B, V]
    element gather + its scatter transpose (~2.2 ms profiled), which
    micro-swept as an XLA lowering floor: sorted indices and a chunked
    one-hot-dot dscores were no faster (2026-08-17). The TRAINING loss
    can avoid even that by consuming the dense scores with
    candidate-multiset counts (``model.dense_candidate_loss``); this
    gathered form remains the eval path (deterministic stored candidate
    sets, predictions by candidate index)."""
    scores = _score_vocab(z, word_emb, scale)
    return jnp.take_along_axis(scores, candidates, axis=1)


class VLMapDescriptionModel(nn.Module):
    """Description blank-fill variant (reference C6's description/answer
    encoder models): GRU over the blanked region phrase in the shared word
    space, fused with the task-conditioned visual feature, scoring
    same-task candidate words for the blank."""

    vocab_size: int
    num_tasks: int = 32
    feature_dim: int = 2048
    word_dim: int = 300
    rnn_dim: int = 256
    task_dim: int = 64
    hidden_dim: int = 1024
    dropout: float = 0.5
    dtype: Any = jnp.bfloat16
    use_pallas: bool = True
    # Bidirectional phrase encoder (model.bidirectional_desc): blank fill
    # is a two-sided-context task — the backward GRU hands the blank's
    # right context to the encoding directly. Fwd state dim stays rnn_dim
    # per direction (encoder output 2*rnn_dim feeds the fusion MLP).
    bidirectional: bool = False
    # Training emits dense [B, V] logits (model.dense_candidate_loss);
    # see VLMapModel.dense_loss.
    dense_loss: bool = False
    word_init: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, feature: jnp.ndarray, desc_ids: jnp.ndarray,
                 task: jnp.ndarray, candidates: jnp.ndarray, *,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        from vqa_transfer_externaldata_tpu.ops.gru import (
            BiGRUEncoder, GRUEncoder)

        dt = self.dtype
        if self.word_init is not None:
            winit = lambda *_: jnp.asarray(self.word_init, jnp.float32)
        else:
            winit = nn.initializers.normal(0.01)
        word_emb = _WordTable(self.vocab_size, self.word_dim, winit,
                              name="word_emb")()

        # Blanked-description encoder in the shared word space (the blank
        # itself is <unk>, which stays visible to the GRU as context).
        mask = (desc_ids != PAD_ID).astype(jnp.float32)
        # Lookup of transposed ids: words are born [T, B, D] — the
        # recurrence's layout — so neither the gather output nor the
        # backward's dwords needs a relayout copy ahead of the
        # embedding scatter (models/vqa_attention.py, same trick). The
        # BiGRU shares one lookup across both directions (the reverse
        # direction reverses IN-KERNEL, ops/gru.py).
        words_tm = jnp.take(word_emb, desc_ids.T, axis=0).astype(dt)
        if self.bidirectional:
            d = BiGRUEncoder(self.rnn_dim, dtype=dt, time_major=True,
                             use_pallas=self.use_pallas,
                             name="desc_bigru")(words_tm, mask)
        else:
            d = GRUEncoder(self.rnn_dim, dtype=dt,
                           use_pallas=self.use_pallas, time_major=True,
                           name="desc_gru")(words_tm, mask)

        task_table = self.param("task_embedding",
                                nn.initializers.normal(0.02),
                                (self.num_tasks, self.task_dim), jnp.float32)
        t_emb = jnp.take(task_table, task, axis=0).astype(dt)
        x = jnp.concatenate([feature.astype(dt), d.astype(dt), t_emb],
                            axis=-1)
        z = MLP([self.hidden_dim, self.word_dim], dropout=self.dropout,
                dtype=dt, name="visual_proj")(x, train=train)
        scale = self.param("logit_scale", nn.initializers.constant(10.0),
                           (), jnp.float32)
        proj = l2_normalize(z.astype(jnp.float32))
        if self.dense_loss and train:
            return {"logits_vocab": _score_vocab(z, word_emb, scale),
                    "projection": proj}
        logits = _score_candidates(z, word_emb, candidates, scale)
        return {"logits": logits, "projection": proj}


def vlmap_loss(outputs: Dict[str, jnp.ndarray],
               batch: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, Dict]:
    """Softmax CE over the K candidate words (reference C6 losses).
    ``example_mask`` (attached by the evaler's padded epoch) zeroes padded
    rows; ``weight`` lets split-level means weight batches exactly.

    When the model emitted dense vocab logits (``dense_loss`` training
    path) the same CE is computed as a count-weighted logsumexp over the
    vocab axis — mathematically AND numerically identical for the same
    candidate multiset (probed bitwise-equal gradients on v5e), with the
    [B, K] gather and its backward scatter replaced by dense elementwise
    work that XLA fuses into the score matmul's epilogue."""
    if "logits_vocab" in outputs:
        return _vlmap_dense_loss(outputs, batch)
    logits = outputs["logits"].astype(jnp.float32)
    labels = batch["label"]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    w = (batch["example_mask"].astype(jnp.float32)
         if "example_mask" in batch else jnp.ones_like(nll))
    denom = jnp.maximum(w.sum(), 1.0)
    loss = jnp.sum(nll * w) / denom
    hit = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
    acc = jnp.sum(hit * w) / denom
    return loss, {"loss": loss, "accuracy": acc, "weight": w.sum()}


def _vlmap_dense_loss(outputs: Dict[str, jnp.ndarray],
                      batch: Dict[str, jnp.ndarray]
                      ) -> Tuple[jnp.ndarray, Dict]:
    """Count-weighted dense CE: batch carries the candidate MULTISET as
    ``cand_counts`` [B, V] uint16 (data layer; datasets.attach_candidate_
    counts) and the positive word id as ``word``. Identity:

        CE over K candidates = log Σ_v count[b,v]·e^{s[b,v]} − s[b,word]

    (counts carry with-replacement duplicates, so this is exact, not an
    approximation). Accuracy is word-level argmax over the candidate-
    masked dense scores — identical to position-level argmax up to
    duplicate ties."""
    s = outputs["logits_vocab"].astype(jnp.float32)  # [B, V]
    c = batch["cand_counts"].astype(jnp.float32)
    word = batch["word"]
    w = (batch["example_mask"].astype(jnp.float32)
         if "example_mask" in batch else
         jnp.ones(s.shape[0], jnp.float32))
    masked = jnp.where(c > 0, s, -1e30)  # finite: keeps padded rows NaN-free
    m = jax.lax.stop_gradient(jnp.max(masked, axis=-1, keepdims=True))
    # exp only where c > 0: non-candidate entries can sit above the
    # candidate max (m is a candidate-only max), and a grown logit_scale
    # could push exp(s - m) to inf there. The INNER where clamps the exp
    # input itself — an outer where alone zeroes the forward value but
    # its backward still multiplies the (zero) cotangent by the inf
    # primal, yielding NaN gradients once any non-candidate logit
    # exceeds the candidate max by ~88.7 (f32 exp overflow).
    e = jnp.where(c > 0, c * jnp.exp(jnp.where(c > 0, s, m) - m), 0.0)
    # max-candidate entry contributes count*exp(0) >= 1, so the floor
    # only bites all-zero-count (padded) rows — where log(0) = -inf
    # would otherwise send 0/0 = NaN through the log VJP into shared
    # parameter gradients even though the nll itself is masked below.
    lse = jnp.log(jnp.maximum(jnp.sum(e, -1), 1e-30)) + m[:, 0]
    pos = jnp.take_along_axis(s, word[:, None], axis=1)[:, 0]
    nll = jnp.where(w > 0, lse - pos, 0.0)
    denom = jnp.maximum(w.sum(), 1.0)
    loss = jnp.sum(nll * w) / denom
    hit = (jnp.argmax(masked, -1) == word).astype(jnp.float32)
    acc = jnp.sum(hit * w) / denom
    return loss, {"loss": loss, "accuracy": acc, "weight": w.sum()}
