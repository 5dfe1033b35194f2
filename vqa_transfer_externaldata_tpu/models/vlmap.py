"""Stage-1 pretraining model (reference C6, ``model_vlmap`` family).

Task-conditional visual classifiers over Visual Genome region descriptions:
given a region's visual feature and a discovered task (visual-word group),
score candidate answer words by dot product in a word-embedding space that is
GloVe-initialized and trained jointly. After pretraining, the word-embedding
table (plus the visual projection) is what transfers into the stage-2 VQA
model's answer classifier (reference C12; SURVEY.md section 0).

Batch format: ``feature`` [B, C] region visual feature, ``task`` [B] int32
task id, ``candidates`` [B, K] int32 word ids (row 0..K-1, one positive),
``label`` [B] int32 index of the positive within candidates.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vqa_transfer_externaldata_tpu.ops.layers import MLP, l2_normalize


class VLMapModel(nn.Module):
    vocab_size: int
    num_tasks: int = 32
    feature_dim: int = 2048
    word_dim: int = 300
    task_dim: int = 64
    hidden_dim: int = 1024
    dropout: float = 0.5
    dtype: Any = jnp.bfloat16
    word_init: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, feature: jnp.ndarray, task: jnp.ndarray,
                 candidates: jnp.ndarray, *,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        B, K = candidates.shape

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

        # Candidate scoring: gather candidate embeddings and score by scaled
        # cosine similarity in the shared space.
        cand_emb = jnp.take(word_emb, candidates.reshape(-1), axis=0)
        cand_emb = cand_emb.reshape(B, K, self.word_dim)
        zn = l2_normalize(z.astype(jnp.float32))
        en = l2_normalize(cand_emb.astype(jnp.float32))
        scale = self.param("logit_scale", nn.initializers.constant(10.0),
                           (), jnp.float32)
        logits = jnp.einsum("bd,bkd->bk", zn, en,
                            preferred_element_type=jnp.float32) * scale
        return {"logits": logits, "projection": zn}

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


def vlmap_loss(outputs: Dict[str, jnp.ndarray],
               batch: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, Dict]:
    """Softmax CE over the K candidate words (reference C6 losses).
    ``example_mask`` (attached by the evaler's padded epoch) zeroes padded
    rows; ``weight`` lets split-level means weight batches exactly."""
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
