"""End-to-end raw-image VQA model (BASELINE.json config 5).

Raw COCO JPEG pixels -> on-device normalize -> fused ResNet-101 -> 14x14x2048
grid -> the same attention VQA head as the precomputed-feature model, all in
ONE jit-compiled program. This is the rebuild of the reference's offline
feature-extraction stage (SURVEY.md section 3.4) folded into the training
step (section 3.6): no HDF5 feature intermediates, no host<->device grid
transfers — the image tensor is the only input.

The backbone runs frozen (inference BatchNorm + stop_gradient), matching the
reference's use of a fixed ImageNet extractor; set ``freeze_backbone=False``
to fine-tune end to end.

Batch format: ``images`` [B, S, S, 3] uint8 RGB (S=448), ``q_ids`` [B, T].
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vqa_transfer_externaldata_tpu.models.vqa_attention import (
    VQAAttentionModel, vqa_loss)
from vqa_transfer_externaldata_tpu.ops.resnet import (
    RESNET101_STAGES, ResNetV1, preprocess_images)

end2end_loss = vqa_loss


class VQAEnd2EndModel(nn.Module):
    vocab_size: int
    num_answers: int
    word_dim: int = 300
    rnn_dim: int = 512
    fusion_dim: int = 1024
    att_hidden: int = 512
    answer_dim: int = 300
    dropout: float = 0.5
    dtype: Any = jnp.bfloat16
    use_pallas: bool = True
    freeze_backbone: bool = True
    image_size: int = 448
    stage_sizes: Sequence[int] = RESNET101_STAGES
    width: int = 64
    # space_to_depth stem measured 2.5x faster than the plain 7x7 stem on
    # v5e (exact kernel rewrite, ops/resnet.py).
    stem: str = "space_to_depth"
    word_init: Optional[np.ndarray] = None
    answer_init: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, images: jnp.ndarray, q_ids: jnp.ndarray,
                 *, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = preprocess_images(images, self.image_size)
        feats = ResNetV1(stage_sizes=tuple(self.stage_sizes),
                         width=self.width, dtype=self.dtype, stem=self.stem,
                         name="resnet")(
            x, train=False)  # frozen BN always (reference: fixed extractor)
        grid = feats["grid"]
        B, h, w, C = grid.shape
        features = grid.reshape(B, h * w, C)
        if self.freeze_backbone:
            features = jax.lax.stop_gradient(features)
        head = VQAAttentionModel(
            vocab_size=self.vocab_size, num_answers=self.num_answers,
            word_dim=self.word_dim, rnn_dim=self.rnn_dim,
            fusion_dim=self.fusion_dim, att_hidden=self.att_hidden,
            answer_dim=self.answer_dim, dropout=self.dropout,
            dtype=self.dtype, use_pallas=self.use_pallas,
            word_init=self.word_init, answer_init=self.answer_init,
            feature_grad=not self.freeze_backbone,
            name="head")
        return head(features, q_ids, train=train)
