"""No-attention VQA baseline (BASELINE.json config 1).

Mean pool5 image feature + bag-of-GloVe question vector -> answer MLP.
This is the CPU-runnable smoke-path model that anchors the end-to-end slice
(SURVEY.md section 7 step 2); it shares the batch format, loss, and answer
classifier conventions with the attention model so the trainer/evaler are
identical across the zoo.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from vqa_transfer_externaldata_tpu.models.vqa_attention import vqa_loss
from vqa_transfer_externaldata_tpu.ops.layers import (
    MLP, WordEmbedding, masked_mean)
from vqa_transfer_externaldata_tpu.utils.vocab import PAD_ID

vqa_baseline_loss = vqa_loss  # same objective/metrics as the full model


class VQABaselineModel(nn.Module):
    vocab_size: int
    num_answers: int
    word_dim: int = 300
    fusion_dim: int = 1024
    dropout: float = 0.5
    dtype: Any = jnp.bfloat16
    word_init: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, pool5: jnp.ndarray, q_ids: jnp.ndarray,
                 *, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        mask = (q_ids != PAD_ID).astype(jnp.float32)
        words = WordEmbedding(self.vocab_size, self.word_dim,
                              init_matrix=self.word_init, dtype=dt,
                              name="word_emb")(q_ids)
        q_bag = masked_mean(words.astype(jnp.float32), mask).astype(dt)
        x = jnp.concatenate([pool5.astype(dt),
                             q_bag], axis=-1)
        h = MLP([self.fusion_dim, self.fusion_dim], dropout=self.dropout,
                dtype=dt, final_activation=True, name="mlp")(x, train=train)
        logits = nn.Dense(self.num_answers, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="classifier")(
                              h.astype(jnp.float32))
        return {"logits": logits}
