"""Single-glimpse spatial attention over the image feature grid.

This is the reference's hot op (SURVEY.md C8): a 2-layer score MLP on the
question vector tiled over the 14x14 ResNet grid, a softmax over the N=196
cells, and an attention-weighted sum of the grid features:

    h      = relu(v @ Wv + (q @ Wq + bq))        # [B, N, H]
    score  = h @ w_s                              # [B, N]
    alpha  = softmax_N(score)                     # [B, N]
    v_att  = sum_N alpha * v                      # [B, C]

The question projection ``qh = q @ Wq + bq`` is tiny and computed by the
caller; everything N-sized is fused into ONE Pallas kernel so the [B, N, C]
grid is read from HBM exactly once per step (HBM bandwidth is the bound —
SURVEY.md section 7 step 3). A scalar score bias is omitted: softmax is
shift-invariant so it cannot affect any output.

Kernel design (Mosaic requires block trailing dims divisible by (8, 128)):
the grid dimension N is zero-padded to a multiple of the N-chunk size and
processed as a *streaming online softmax* (flash-attention pattern): grid =
(batch tiles, N chunks); running max / denominator / weighted-sum accumulator
live in VMEM scratch; padded cells are masked to -inf before the max. This
scales to arbitrarily large attention grids (e.g. higher-resolution feature
maps) without ever holding more than one [TB, NB, C] tile of features.

Gradients: ``jax.custom_vjp`` whose backward recomputes the forward in plain
jnp and differentiates that — activations are cheap to rebuild and this keeps
one source of truth for the backward math.

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

_NEG_INF = -1e30


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


def spatial_attention_multi(
    v: jnp.ndarray,  # [B, N, C]
    qh: jnp.ndarray,  # [B, H]
    wv: jnp.ndarray,  # [C, H]
    w_score: jnp.ndarray,  # [H, G] — one score vector per glimpse
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-glimpse variant (XLA path): G independent softmaxes over the
    grid; returns (v_att [B, G*C] f32 concat, alpha [B, N, G]). G=2 is the
    Show-Ask-Attend-Answer-style strong baseline (PAPERS.md)."""
    dt = v.dtype
    hi = jax.lax.Precision.HIGHEST
    h = jnp.einsum("bnc,ch->bnh", v, wv.astype(dt),
                   preferred_element_type=jnp.float32, precision=hi)
    h = jax.nn.relu(h + qh[:, None, :].astype(jnp.float32))
    score = jnp.einsum("bnh,hg->bng", h.astype(dt), w_score.astype(dt),
                       preferred_element_type=jnp.float32, precision=hi)
    alpha = jax.nn.softmax(score, axis=1)  # [B, N, G]
    v_att = jnp.einsum("bng,bnc->bgc", alpha.astype(dt), v,
                       preferred_element_type=jnp.float32, precision=hi)
    B, G, C = v_att.shape
    return v_att.reshape(B, G * C), alpha


# ---------------------------------------------------------------------------
# Pallas streaming kernel
# ---------------------------------------------------------------------------


def _make_kernel(n_valid: int, tb: int, nb: int, normalize: bool):
    def kernel(v_ref, qh_ref, wv_ref, ws_ref,
               vatt_ref, alpha_ref, m_scr, d_scr, acc_scr):
        j = pl.program_id(1)
        last = pl.num_programs(1) - 1

        @pl.when(j == 0)
        def _():
            m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
            d_scr[:] = jnp.zeros_like(d_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)
            alpha_ref[:] = jnp.zeros_like(alpha_ref)

        v = v_ref[:]  # [TB, NB, C]
        dt = v.dtype
        C = v.shape[-1]
        H = qh_ref.shape[-1]

        if normalize:
            # Fused per-cell L2 normalization WITHOUT materializing a
            # normalized copy of the tile: row scaling commutes with the
            # right-matmul (r_n v_n) @ Wv = r_n (v_n @ Wv), so ``r`` is
            # applied to the (4x smaller) hidden and folded into the
            # softmax weights for the weighted sum.
            sq = jnp.sum(jnp.square(v), axis=-1, dtype=jnp.float32)
            r = jax.lax.rsqrt(sq + 1e-12)  # [TB, NB] f32
        else:
            r = None

        # Score MLP hidden: one [TB*NB, C] @ [C, H] MXU matmul (f32 acc).
        # No explicit precision: Mosaic rejects HIGHEST in-kernel ("Bad lhs
        # type"); preferred_element_type=f32 already gives MXU f32 accumulate.
        h = jnp.dot(v.reshape(tb * nb, C), wv_ref[:],
                    preferred_element_type=jnp.float32)
        h = h.reshape(tb, nb, H)
        if r is not None:
            h = h * r[:, :, None]
        h = h + qh_ref[:].astype(jnp.float32)[:, None, :]
        h = jnp.maximum(h, 0.0)
        # Scores: lane-reduce against the (row-broadcast) score vector.
        ws_row = ws_ref[:][:1].astype(jnp.float32)  # [1, H]
        s = jnp.sum(h * ws_row[None, :, :], axis=-1)  # [TB, NB] f32
        # Mask padded grid cells. nb is a multiple of 128, so chunk offsets
        # are lane-aligned (Mosaic requires this for the alpha slice write).
        base = pl.multiple_of(j * nb, 128)
        idx = j * nb + jax.lax.broadcasted_iota(jnp.int32, (tb, nb), 1)
        s = jnp.where(idx < n_valid, s, _NEG_INF)

        # Online softmax update (flash pattern).
        m_prev = m_scr[:][:, :1]  # [TB, 1]
        d_prev = d_scr[:][:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)  # [TB, 1]
        p = jnp.exp(s - m_new)  # [TB, NB]
        d_new = d_prev * corr + jnp.sum(p, axis=1, keepdims=True)
        # Weighted-sum accumulator: per-row [1, NB] @ [NB, C] MXU dots —
        # same speed as an elementwise multiply+reduce but without
        # materializing a [TB, NB, C] f32 product in VMEM. The
        # normalization factor folds into the weights: sum p_n v̂_n =
        # sum (p_n r_n) v_n.
        acc_scr[:] = acc_scr[:] * corr
        pw = p if r is None else p * r
        for b in range(tb):
            pr = pw[b:b + 1, :].astype(dt)
            acc_scr[b:b + 1, :] += jnp.dot(
                pr, v[b], preferred_element_type=jnp.float32)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        d_scr[:] = jnp.broadcast_to(d_new, d_scr.shape)

        # Progressive alpha: correct previously-written chunks, write p.
        alpha_ref[:] = alpha_ref[:] * corr
        alpha_ref[:, pl.ds(base, nb)] = p

        @pl.when(j == last)
        def _():
            d = d_scr[:][:, :1]
            vatt_ref[:] = acc_scr[:] / d
            alpha_ref[:] = alpha_ref[:] / d

    return kernel


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit,
                   static_argnames=("interpret", "block_b", "block_n",
                                    "normalize"))
def _attention_pallas_fwd(v, qh, wv, ws, *, interpret: bool,
                          block_b: int = 8, block_n: int = 128,
                          normalize: bool = False):
    B, N, C = v.shape
    H = qh.shape[-1]
    tb, nb = block_b, block_n
    Bp, Np = _round_up(B, tb), _round_up(N, nb)
    vp = v if (Bp, Np) == (B, N) else jnp.pad(
        v, ((0, Bp - B), (0, Np - N), (0, 0)))
    qhp = qh if Bp == B else jnp.pad(qh, ((0, Bp - B), (0, 0)))

    wv = wv.astype(v.dtype)
    ws_rows = jnp.broadcast_to(ws.astype(v.dtype)[None, :], (8, H))

    flops = 2 * Bp * Np * (C * H + H + C)
    vatt, alpha = pl.pallas_call(
        _make_kernel(N, tb, nb, normalize),
        grid=(Bp // tb, Np // nb),
        in_specs=[
            pl.BlockSpec((tb, nb, C), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, H), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, C), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, Np), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, C), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Np), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tb, 128), jnp.float32),  # running max
            pltpu.VMEM((tb, 128), jnp.float32),  # running denominator
            pltpu.VMEM((tb, C), jnp.float32),  # weighted-sum accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=vp.size * vp.dtype.itemsize + Bp * C * 4,
            transcendentals=Bp * Np,
        ),
        interpret=interpret,
    )(vp, qhp, wv, ws_rows)
    return vatt[:B], alpha[:B, :N]


def _attention_bwd_math(v, qh, wv, ws, alpha, vatt, g, ga,
                        normalize: bool = False):
    """Explicit backward from saved residuals (alpha, vatt).

    Only the score-MLP hidden ``h`` is recomputed (one matmul); the softmax
    is NOT re-run — ``S = g . vatt + sum(alpha * ga)`` exploits
    ``sum_n alpha_n (g . v_n) = g . vatt``. This is the reason the op
    carries a custom_vjp at all: jax.grad of the oracle would re-run the
    whole forward before differentiating it.
    """
    dt = v.dtype
    hi = jax.lax.Precision.HIGHEST
    f32 = jnp.float32
    g = g.astype(f32)
    ga = ga.astype(f32)
    alpha = alpha.astype(f32)
    v_raw = v
    if normalize:
        sq = jnp.sum(jnp.square(v.astype(f32)), axis=-1, keepdims=True)
        r = jax.lax.rsqrt(sq + 1e-12)  # [B, N, 1]
        v = (v.astype(f32) * r).astype(dt)
    # dalpha_n = g . v_n + ga_n ; S = sum_n alpha_n dalpha_n
    dalpha = jnp.einsum("bc,bnc->bn", g.astype(dt), v,
                        preferred_element_type=f32, precision=hi) + ga
    S = (jnp.einsum("bc,bc->b", g, vatt.astype(f32),
                    preferred_element_type=f32, precision=hi)
         + jnp.sum(alpha * ga, axis=1))
    ds = alpha * (dalpha - S[:, None])  # [B, N]
    # Recompute hidden activations (one MXU matmul).
    z = jnp.einsum("bnc,ch->bnh", v, wv.astype(dt),
                   preferred_element_type=f32, precision=hi)
    z = z + qh[:, None, :].astype(f32)
    h = jnp.maximum(z, 0.0)
    relu_mask = (z > 0.0).astype(f32)
    dz = relu_mask * (ds[:, :, None] * ws.astype(f32)[None, None, :])
    dws = jnp.einsum("bn,bnh->h", ds, h, preferred_element_type=f32,
                     precision=hi)
    # Single bf16 materialization of dz: dqh sums it with f32 accumulation,
    # so the f32 version never hits HBM.
    dz_c = dz.astype(dt)
    dqh = jnp.sum(dz_c, axis=1, dtype=f32).astype(qh.dtype)
    dwv = jnp.einsum("bnc,bnh->ch", v, dz_c, preferred_element_type=f32,
                     precision=hi)
    dv = (alpha[:, :, None] * g[:, None, :]) + jnp.einsum(
        "bnh,ch->bnc", dz_c, wv.astype(dt), preferred_element_type=f32,
        precision=hi)
    if normalize:
        # Chain through v_hat = v * rsqrt(|v|^2 + eps):
        # dv_raw = r * (dv_hat - v_hat * (v_hat . dv_hat))
        vhat = v.astype(f32)
        inner = jnp.sum(dv * vhat, axis=-1, keepdims=True)
        dv = r * (dv - vhat * inner)
    return (dv.astype(v_raw.dtype), dqh, dwv.astype(wv.dtype),
            dws.astype(ws.dtype))


@functools.lru_cache(maxsize=None)
def _make_fused(interpret: bool, block_b: int, block_n: int,
                normalize: bool, kernel: bool):
    """custom_vjp-wrapped attention. ``kernel`` picks the forward (Pallas
    streaming kernel vs XLA-fused oracle); the backward is always the
    explicit residual-based math — XLA autodiff would run the two big
    backward dots (dv, dwv) in f32 because the cotangents are f32, at 1/4
    the MXU's bf16 rate (profiled: 1.9 ms for dwv alone at B=256)."""

    @jax.custom_vjp
    def fused(v, qh, wv, ws):
        if kernel:
            out = _attention_pallas_fwd(v, qh, wv, ws, interpret=interpret,
                                        block_b=block_b, block_n=block_n,
                                        normalize=normalize)
            return tuple(out)
        if normalize:
            from vqa_transfer_externaldata_tpu.ops.layers import l2_normalize

            return spatial_attention_reference(l2_normalize(v), qh, wv, ws)
        return spatial_attention_reference(v, qh, wv, ws)

    def fwd(v, qh, wv, ws):
        vatt, alpha = fused(v, qh, wv, ws)
        return (vatt, alpha), (v, qh, wv, ws, alpha, vatt)

    def bwd(residuals, cotangents):
        v, qh, wv, ws, alpha, vatt = residuals
        g, ga = cotangents
        return _attention_bwd_math(v, qh, wv, ws, alpha, vatt, g, ga,
                                   normalize=normalize)

    fused.defvjp(fwd, bwd)
    return fused


def spatial_attention(
    v: jnp.ndarray,
    qh: jnp.ndarray,
    wv: jnp.ndarray,
    w_score: jnp.ndarray,
    *,
    normalize: bool = False,
    use_pallas: bool = True,
    custom_grad: bool = True,
    interpret: bool | None = None,
    block_b: int = 8,
    block_n: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatching entrypoint. ``normalize=True`` fuses per-cell L2
    normalization of ``v`` into the op (in-VMEM on the Pallas path).
    ``use_pallas`` picks the forward implementation; the explicit bf16
    backward applies to both unless ``custom_grad=False`` (pure autodiff,
    kept for gradient cross-checks). ``interpret=None`` auto-selects
    interpreter mode off-TPU so tests exercise the kernel path on CPU."""
    if not custom_grad and not use_pallas:
        if normalize:
            from vqa_transfer_externaldata_tpu.ops.layers import l2_normalize

            v = l2_normalize(v)
        return spatial_attention_reference(v, qh, wv, w_score)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_n is None:
        # Lane alignment: alpha chunk writes require nb % 128 == 0.
        block_n = 128
    return _make_fused(interpret, block_b, block_n, normalize,
                       use_pallas)(v, qh, wv, w_score)
