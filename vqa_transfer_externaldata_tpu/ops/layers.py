"""Shared NN building blocks (reference C9: fc/MLP helpers, embedding lookup,
L2-normalize, attention pooling — SURVEY.md section 2).

Everything here is a pure function over explicit params or a tiny flax
module, shape-static and dtype-disciplined: params live in float32, compute
runs in the configured dtype (bfloat16 on TPU) with float32 accumulation on
the MXU (``preferred_element_type``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def dtype_of(name: str) -> jnp.dtype:
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
            "float16": jnp.float16}[name]


def l2_normalize(x: jnp.ndarray, axis: int = -1,
                 eps: float = 1e-12) -> jnp.ndarray:
    """Reference C9 ``l2_normalize`` (used on visual features / embeddings)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True) + eps)
    return x / norm


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray,
                axis: int = 1) -> jnp.ndarray:
    """Mean over ``axis`` of entries where ``mask`` (broadcastable) is true."""
    mask = mask.astype(x.dtype)
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    total = jnp.sum(x * mask, axis=axis)
    count = jnp.maximum(jnp.sum(mask, axis=axis), 1.0)
    return total / count


class MLP(nn.Module):
    """fc stack with ReLU + optional dropout (reference C9 fc helpers)."""

    features: Sequence[int]
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16
    final_activation: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        for i, feat in enumerate(self.features):
            x = nn.Dense(feat, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"fc{i}")(x)
            is_last = i == len(self.features) - 1
            if not is_last or self.final_activation:
                x = nn.relu(x)
                if self.dropout > 0.0:
                    x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class WordEmbedding(nn.Module):
    """Trainable word-embedding table, optionally GloVe-initialized.

    Row 0 is <pad> and is zero-initialized; callers mask padded positions by
    id so no length plumbing reaches the kernel (utils/vocab.py).
    """

    vocab_size: int
    dim: int = 300
    init_matrix: Optional[jnp.ndarray] = None  # [vocab, dim] float32
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        if self.init_matrix is not None:
            init = lambda *_: jnp.asarray(self.init_matrix, jnp.float32)
        else:
            init = nn.initializers.normal(0.01)
        table = self.param("embedding", init, (self.vocab_size, self.dim),
                           jnp.float32)
        return jnp.take(table, ids, axis=0).astype(self.dtype)


def gated_tanh(x: jnp.ndarray, w: nn.Dense, g: nn.Dense) -> jnp.ndarray:
    """Gated-tanh unit used by strong VQA baselines: tanh(Wx) * sigmoid(Gx)."""
    return jnp.tanh(w(x)) * jax.nn.sigmoid(g(x))


class GatedTanh(nn.Module):
    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(self.features, dtype=self.dtype,
                     param_dtype=jnp.float32, name="w")(x)
        gate = nn.Dense(self.features, dtype=self.dtype,
                        param_dtype=jnp.float32, name="g")(x)
        return jnp.tanh(y) * jax.nn.sigmoid(gate)
