"""Stage-2 VQA model (reference C8, ``model_vqa`` family).

GloVe-embedded GRU question encoder -> single-glimpse spatial attention over
the 14x14x2048 ResNet-101 grid -> gated fusion -> answer classifier whose
logits are dot products against an *answer-embedding table*. That table is
the transfer vehicle (the paper's core idea): its rows are initialized from
the stage-1 (vlmap) word-embedding space / GloVe, which is what lets the
model answer out-of-vocabulary answers (SURVEY.md section 0, C8, C12).

Batch format: ``features`` [B, N, C] (N = grid cells), ``q_ids`` [B, T]
int32 (<pad>=0), ``answer_id`` [B] int32 (train), ``answer_scores`` [B, A]
f32 (eval). All shapes static.

Device-resident gather-free mode: ``features`` may instead be a tuple
``(store [M, Np, C], rows [B] int32)`` — the attention kernels then read
each question's grid row straight from the resident store via scalar
prefetch (ops/attention_resident), and no [B, N, C] batch ever
materializes. Enabled by ``--train.resident_fused_attention`` on the
device-resident training/eval paths.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vqa_transfer_externaldata_tpu.ops.attention import spatial_attention
from vqa_transfer_externaldata_tpu.ops.gru import GRUEncoder
from vqa_transfer_externaldata_tpu.ops.layers import (
    GatedTanh, WordEmbedding, l2_normalize)
from vqa_transfer_externaldata_tpu.utils.vocab import PAD_ID, UNK_ID


class VQAAttentionModel(nn.Module):
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
    normalize_v: bool = True
    glimpses: int = 1  # >1: multi-glimpse (gathered XLA or resident path)
    rnn_variant: str = "cudnn"  # "tf": TF1-GRUCell-exact (fidelity)
    # True ONLY when the grid features need a gradient (end2end with an
    # unfrozen backbone). False (feature-store training, frozen backbone)
    # lets the attention backward skip the [B, N, C] dv matmul + write.
    feature_grad: bool = False
    # True grid-cell count when ``features`` is a (store, rows) tuple
    # (the store's cell axis is padded to a sublane multiple).
    n_cells: Optional[int] = None
    # Set by the Trainer on a >1-device data axis: the resident attention
    # op wraps itself in jax.shard_map over this mesh/axis so each device
    # runs its own scalar-prefetch grid (ops/attention_resident docstring).
    data_mesh: Optional[Any] = None
    data_axis_name: str = "data"
    # Set by the Trainer when it L2-normalizes the resident store's cells
    # ONCE at upload (parallel/trainer._prepare_resident): the resident
    # kernels then skip the per-access sum-of-squares/rsqrt entirely
    # (identical math — normalizing constant data is a forward transform,
    # feature_grad is False by construction). Only consulted on the
    # (store, rows) path; gathered features always normalize in-model.
    store_prenormalized: bool = False
    # Set by the Trainer alongside an int8-quantized resident store
    # (train.store_quantize): the global dequantization scale the op
    # folds outside its kernels. 1.0 for float stores.
    store_scale: float = 1.0
    # Set by the Trainer for a row-sharded resident store
    # (train.store_sharded): the store arrives partitioned over the data
    # axis and feat_rows are per-shard LOCAL indices — the op's shard_map
    # takes P(data) for the store instead of replicating it
    # (ops/attention_resident store_sharded docstring).
    store_sharded: bool = False
    word_init: Optional[np.ndarray] = None  # [vocab, word_dim] GloVe
    answer_init: Optional[np.ndarray] = None  # [answers, answer_dim]

    @nn.compact
    def __call__(self, features: jnp.ndarray, q_ids: jnp.ndarray,
                 *, train: bool = False) -> Dict[str, jnp.ndarray]:
        dt = self.dtype
        resident = isinstance(features, (tuple, list))
        if resident:
            store, feat_rows = features
            _, N, C = store.shape
        else:
            B, N, C = features.shape

        # --- question encoder -------------------------------------------
        # Embedding lookup of TRANSPOSED ids: words are born [T, B, D] —
        # the layout the GRU recurrence consumes — so neither the gather
        # output nor (in the backward) the dwords cotangent ahead of the
        # embedding scatter needs a relayout copy (transposing the int32
        # ids is 26 KB; transposing the activations was 4 MB each way,
        # ~0.03 ms/step at B=256 — BASELINE.md step tail). Same params,
        # same math: scatter-add order is immaterial.
        mask = (q_ids != PAD_ID).astype(jnp.float32)
        emb = WordEmbedding(self.vocab_size, self.word_dim,
                            init_matrix=self.word_init, dtype=dt,
                            name="word_emb")
        if self.rnn_variant == "tf":
            from vqa_transfer_externaldata_tpu.ops.gru import TFGRUEncoder

            # TFGRUEncoder consumes batch-major [B, T, D]; look the ids up
            # batch-major — a time-major lookup here would reintroduce the
            # exact activation relayout the transposed lookup below avoids.
            q = TFGRUEncoder(self.rnn_dim, dtype=dt, name="gru")(
                emb(q_ids), mask)
        else:
            q = GRUEncoder(self.rnn_dim, dtype=dt,
                           use_pallas=self.use_pallas, time_major=True,
                           name="gru")(emb(q_ids.T), mask)  # [T, B, D]

        # --- single-glimpse spatial attention (fused Pallas kernel; the
        # per-cell L2 normalization is fused into the op) ----------------
        v = None if resident else features.astype(dt)
        qh = nn.Dense(self.att_hidden, dtype=dt, param_dtype=jnp.float32,
                      name="att_q")(q)
        wv = self.param("att_wv", nn.initializers.glorot_uniform(),
                        (C, self.att_hidden), jnp.float32)
        if self.glimpses > 1:
            ws_g = self.param("att_ws", nn.initializers.normal(0.05),
                              (self.att_hidden, self.glimpses), jnp.float32)
            if resident:
                # G-glimpse gather-free path: same resident op, 2-D
                # w_score (ops/attention_resident G-glimpse kernels).
                from vqa_transfer_externaldata_tpu.ops.attention_resident \
                    import spatial_attention_resident

                quant = jnp.issubdtype(store.dtype, jnp.integer)
                v_att, alpha = spatial_attention_resident(
                    store if quant else store.astype(dt),
                    feat_rows, qh, wv, ws_g,
                    n_valid=self.n_cells or store.shape[1],
                    normalize=(self.normalize_v
                               and not self.store_prenormalized
                               and not quant),
                    store_scale=self.store_scale if quant else 1.0,
                    mesh=self.data_mesh, data_axis=self.data_axis_name,
                    store_sharded=self.store_sharded)
            else:
                from vqa_transfer_externaldata_tpu.ops.attention import (
                    spatial_attention_multi)

                vn = l2_normalize(v) if self.normalize_v else v
                v_att, alpha = spatial_attention_multi(vn, qh, wv, ws_g)
        else:
            ws = self.param("att_ws", nn.initializers.normal(0.05),
                            (self.att_hidden,), jnp.float32)
            if resident:
                from vqa_transfer_externaldata_tpu.ops.attention_resident \
                    import spatial_attention_resident

                quant = jnp.issubdtype(store.dtype, jnp.integer)
                v_att, alpha = spatial_attention_resident(
                    store if quant else store.astype(dt),
                    feat_rows, qh, wv, ws,
                    n_valid=self.n_cells or store.shape[1],
                    normalize=(self.normalize_v
                               and not self.store_prenormalized
                               and not quant),
                    store_scale=self.store_scale if quant else 1.0,
                    mesh=self.data_mesh, data_axis=self.data_axis_name,
                    store_sharded=self.store_sharded)
            else:
                # Mode-dependent forward dispatch (measured on v5e, batch
                # 256): the Pallas streaming kernel wins forward-only
                # (1.8 vs 2.0 ms) — eval/serving take it; training takes
                # XLA's fused forward. The backward is the explicit bf16
                # jnp math (autodiff would run the dv/dwv dots in f32 at
                # 1/4 MXU rate — profiled 1.9 ms for dwv alone);
                # feature_grad=False (feature-store training, frozen
                # backbone) skips the two [B, N, C] dv matmuls. The fused
                # Pallas backward exists but measured slower at this grid
                # size (A/B in ops/attention._make_fused).
                v_att, alpha = spatial_attention(
                    v, qh, wv, ws, normalize=self.normalize_v,
                    use_pallas=(self.use_pallas and not train),
                    feature_grad=self.feature_grad)

        # --- fusion (elementwise product of gated projections) ----------
        fq = GatedTanh(self.fusion_dim, dtype=dt, name="fuse_q")(q)
        fv = GatedTanh(self.fusion_dim, dtype=dt,
                       name="fuse_v")(v_att.astype(dt))
        fused = fq * fv
        fused = nn.Dropout(self.dropout, deterministic=not train)(fused)

        # --- answer-embedding classifier (transfer vehicle) -------------
        z = nn.Dense(self.answer_dim, dtype=dt, param_dtype=jnp.float32,
                     name="ans_proj")(fused)
        if self.answer_init is not None:
            ans_init = lambda *_: jnp.asarray(self.answer_init, jnp.float32)
        else:
            ans_init = nn.initializers.normal(0.01)
        ans_emb = self.param("answer_embedding", ans_init,
                             (self.num_answers, self.answer_dim), jnp.float32)
        # Cosine-style logits with a learnable temperature: keeps the scale
        # of GloVe-initialized rows from dominating early training.
        z = l2_normalize(z.astype(jnp.float32))
        e = l2_normalize(ans_emb)
        scale = self.param("logit_scale",
                           nn.initializers.constant(10.0), (), jnp.float32)
        bias = self.param("logit_bias", nn.initializers.zeros,
                          (self.num_answers,), jnp.float32)
        logits = jnp.dot(z, e.T, preferred_element_type=jnp.float32)
        logits = logits * scale + bias
        return {"logits": logits, "alpha": alpha}


def vqa_loss(outputs: Dict[str, jnp.ndarray],
             batch: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, Dict]:
    """Softmax CE on the target answer id; questions whose answer fell out
    of the top-K vocab (<unk>) carry zero weight, matching the reference's
    answer-in-vocab training filter (SURVEY.md C2/C8).

    ``example_mask`` (0/1 per row, attached by the evaler's padded epoch)
    additionally zeroes padded rows; ``weight`` in the returned metrics is
    the valid-row count so split-level means can weight per-batch means
    exactly instead of diluting against the padded final batch."""
    logits = outputs["logits"].astype(jnp.float32)
    labels = batch["answer_id"]
    weight = (labels != UNK_ID).astype(jnp.float32)
    if "example_mask" in batch:
        weight = weight * batch["example_mask"].astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    denom = jnp.maximum(weight.sum(), 1.0)
    loss = jnp.sum(nll * weight) / denom
    pred = jnp.argmax(logits, axis=-1)
    acc = jnp.sum((pred == labels).astype(jnp.float32) * weight) / denom
    metrics = {"loss": loss, "accuracy": acc, "weight": weight.sum()}
    if "answer_scores" in batch:
        rows = jnp.arange(pred.shape[0])
        # In-loop indicator, weighted like loss/accuracy; evaluate_split
        # recomputes the exact split-level number from the score table.
        metrics["vqa_accuracy"] = jnp.sum(
            batch["answer_scores"][rows, pred] * weight) / denom
    return loss, metrics
