"""Single-glimpse spatial attention over the image feature grid.

This is the reference's hot op (SURVEY.md C8): a 2-layer score MLP on the
question vector tiled over the 14x14 ResNet grid, a softmax over the 196
cells, and an attention-weighted sum of the grid features:

    h      = relu(v @ Wv + (q @ Wq + bq))        # [B, N, H], N = 196
    score  = h @ w_s                              # [B, N]
    alpha  = softmax_N(score)                     # [B, N]
    v_att  = sum_N alpha * v                      # [B, C]

The question projection ``qh = q @ Wq + bq`` is tiny and computed by the
caller; everything N-sized is fused into one Pallas kernel so the [B, N, C]
grid is read from HBM exactly once per step (HBM bandwidth is the bound —
SURVEY.md section 7 step 3). A scalar score bias is omitted: softmax is
shift-invariant so it cannot affect any output.

Gradients: the op carries a ``jax.custom_vjp`` whose backward pass recomputes
the forward in plain jnp and differentiates that — the activations are cheap
to rebuild and this keeps a single source of truth for the backward math.

``spatial_attention_reference`` is the pure-jnp oracle used for unit tests
and as the non-Pallas fallback.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def spatial_attention_reference(
    v: jnp.ndarray,  # [B, N, C] grid features
    qh: jnp.ndarray,  # [B, H] projected question (q @ Wq + bq)
    wv: jnp.ndarray,  # [C, H]
    w_score: jnp.ndarray,  # [H]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure-jnp oracle. Returns (v_att [B, C] f32, alpha [B, N] f32)."""
    dt = v.dtype
    # Precision.HIGHEST: full f32 accumulation when inputs are f32 (bf16
    # inputs still take the fast MXU path); the XLA-CPU default otherwise
    # accumulates a batched dot in reduced precision.
    hi = jax.lax.Precision.HIGHEST
    h = jnp.einsum("bnc,ch->bnh", v, wv.astype(dt),
                   preferred_element_type=jnp.float32, precision=hi)
    h = jax.nn.relu(h + qh[:, None, :].astype(jnp.float32))
    score = jnp.einsum("bnh,h->bn", h.astype(dt), w_score.astype(dt),
                       preferred_element_type=jnp.float32, precision=hi)
    alpha = jax.nn.softmax(score, axis=1)
    v_att = jnp.einsum("bn,bnc->bc", alpha.astype(dt), v,
                       preferred_element_type=jnp.float32, precision=hi)
    return v_att, alpha


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _attention_kernel(v_ref, qh_ref, wv_ref, ws_ref, vatt_ref, alpha_ref):
    TB, N, C = v_ref.shape
    H = qh_ref.shape[-1]
    v = v_ref[:]  # [TB, N, C]
    dt = v.dtype
    # HIGHEST: full f32 accumulation for f32 inputs (bf16 inputs — the prod
    # path — natively accumulate f32 on the MXU, so this costs nothing).
    hi = jax.lax.Precision.HIGHEST
    # Score MLP hidden: one [TB*N, C] @ [C, H] MXU matmul, f32 accumulate.
    h = jnp.dot(v.reshape(TB * N, C), wv_ref[:],
                preferred_element_type=jnp.float32, precision=hi)
    h = h.reshape(TB, N, H) + qh_ref[:].astype(jnp.float32)[:, None, :]
    h = jnp.maximum(h, 0.0)
    # Scores: [TB*N, H] @ [H, 1].
    score = jnp.dot(h.reshape(TB * N, H).astype(dt), ws_ref[:],
                    preferred_element_type=jnp.float32, precision=hi)
    score = score.reshape(TB, N)
    # Numerically-stable softmax over the N grid cells.
    score = score - jnp.max(score, axis=1, keepdims=True)
    expd = jnp.exp(score)
    alpha = expd / jnp.sum(expd, axis=1, keepdims=True)  # [TB, N] f32
    alpha_ref[:] = alpha
    # Weighted sum over cells (VPU multiply + reduce; v stays in VMEM).
    vatt_ref[:] = jnp.sum(alpha[:, :, None] * v.astype(jnp.float32), axis=1)


def _pick_block(b: int, target: int = 8) -> int:
    for cand in range(min(target, b), 0, -1):
        if b % cand == 0:
            return cand
    return 1


@functools.partial(jax.jit, static_argnames=("interpret", "block_b"))
def _attention_pallas_fwd(v, qh, wv, ws, *, interpret: bool, block_b: int):
    B, N, C = v.shape
    H = qh.shape[-1]
    ws2 = ws.reshape(H, 1).astype(v.dtype)
    wv = wv.astype(v.dtype)
    qh = qh.astype(jnp.float32)
    grid = (B // block_b,)
    flops = 2 * B * N * (C * H + H + C)
    return pl.pallas_call(
        _attention_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, C), jnp.float32),
            jax.ShapeDtypeStruct((B, N), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=v.size * v.dtype.itemsize + B * C * 4,
            transcendentals=B * N,
        ),
        interpret=interpret,
    )(v, qh, wv, ws2)


@functools.lru_cache(maxsize=None)
def _make_fused(interpret: bool, block_b: int):
    @jax.custom_vjp
    def fused(v, qh, wv, ws):
        out = _attention_pallas_fwd(v, qh, wv, ws, interpret=interpret,
                                    block_b=block_b)
        return tuple(out)

    def fwd(v, qh, wv, ws):
        return fused(v, qh, wv, ws), (v, qh, wv, ws)

    def bwd(residuals, cotangents):
        # Recompute-in-jnp backward: differentiates the oracle, which is
        # numerically the same function the kernel computes.
        _, vjp = jax.vjp(spatial_attention_reference, *residuals)
        return vjp(cotangents)

    fused.defvjp(fwd, bwd)
    return fused


def spatial_attention(
    v: jnp.ndarray,
    qh: jnp.ndarray,
    wv: jnp.ndarray,
    w_score: jnp.ndarray,
    *,
    use_pallas: bool = True,
    interpret: bool | None = None,
    block_b: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatching entrypoint. ``interpret=None`` auto-selects interpreter
    mode off-TPU so tests exercise the same kernel code path on CPU."""
    if not use_pallas:
        return spatial_attention_reference(v, qh, wv, w_score)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_b is None:
        block_b = _pick_block(v.shape[0])
    return _make_fused(interpret, block_b)(v, qh, wv, w_score)
