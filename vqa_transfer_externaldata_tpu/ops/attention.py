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


def _reference_postscaled(
    v: jnp.ndarray,  # [B, N, C] raw grid features
    qh: jnp.ndarray,  # [B, H]
    wv: jnp.ndarray,  # [C, H]
    w_score: jnp.ndarray,  # [H]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized-attention oracle in the KERNEL's rounding convention:
    per-cell L2 normalization applied AFTER the score matmul
    (``(v @ Wv) * r``) and folded into the weighted-sum weights
    (``sum (alpha r) v``) — exactly how the Pallas forward and backward
    kernels compute it. Used as the XLA training forward when the Pallas
    backward is active so both sides agree bit-closely on the relu mask."""
    dt = v.dtype
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST
    r = jax.lax.rsqrt(jnp.sum(jnp.square(v.astype(f32)), axis=-1) + 1e-12)
    h = jnp.einsum("bnc,ch->bnh", v, wv.astype(dt),
                   preferred_element_type=f32, precision=hi)
    h = jax.nn.relu(h * r[:, :, None] + qh[:, None, :].astype(f32))
    score = jnp.einsum("bnh,h->bn", h.astype(dt), w_score.astype(dt),
                       preferred_element_type=f32, precision=hi)
    alpha = jax.nn.softmax(score, axis=1)
    v_att = jnp.einsum("bn,bnc->bc", (alpha * r).astype(dt), v,
                       preferred_element_type=f32, precision=hi)
    return v_att, alpha


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


def _make_bwd_kernel(tb: int, nb: int, hb: int, normalize: bool):
    """Fused backward: dqh/dwv/dws computed in-VMEM per (batch tile,
    N chunk). The jnp backward (_attention_bwd_math) reads the grid 3-4
    times (dalpha dot, hidden recompute, dwv) and materializes [B, N, H]
    intermediates in HBM; here the v tile is fetched ONCE and all three
    parameter cotangents accumulate on-chip.

    Accumulation discipline: grid is (hc, i, j) with the H-chunk axis
    OUTERMOST, so every output block's index is constant across the grid
    steps that accumulate into it (dwv/dws over the full inner (i, j)
    sweep for each hc; dqh over the inner j sweep) — Mosaic only
    guarantees read-modify-write output semantics for consecutive visits
    to the same block (measured: an (i, j, hc) grid with hc innermost
    compiles but silently drops accumulated updates on block revisits —
    15% error on dqh). The price is that v is re-fetched once per H
    chunk (2x HBM traffic at hb=256); full-H blocks would read v once
    but the [C, H] f32 dwv output block alone is 4 MB and Mosaic
    double-buffers ALL blocks, blowing the 16 MB VMEM budget (measured
    21.8 MB).

    VMEM discipline: nothing [TB, NB, C]-shaped is ever materialized as
    a temporary. The softmax-Jacobian term ``ds`` and the per-cell norm
    ``r`` arrive as INPUTS — ``ds`` needs ``g . v_hat`` (an extra
    bandwidth-bound pass over the grid that XLA runs outside, ~0.1 ms vs
    the ~10 MB of VMEM an in-kernel product would cost), and ``r`` is a
    residual of the forward (CSEd against the primal's own
    normalization). Within a block, H is processed in 128-wide static
    sub-slices so temporaries stay [TB, NB, 128]-sized (~0.5 MB, reused
    across the sub-loop — disjoint lifetimes).

    dv (the grid-feature cotangent) is deliberately NOT computed here: the
    feature-store models and the frozen end2end backbone need no feature
    gradient (feature_grad=False skips it entirely); the rare unfrozen
    path takes the jnp backward."""
    del hb  # block width comes from the refs; sub-slicing is fixed at 128

    def kernel(v_ref, qh_ref, wv_ref, ws_ref, ds_ref, r_ref,
               dqh_ref, dwv_ref, dws_ref):
        i, j = pl.program_id(1), pl.program_id(2)
        f32 = jnp.float32

        @pl.when((i == 0) & (j == 0))
        def _():
            dwv_ref[:] = jnp.zeros_like(dwv_ref)
            dws_ref[:] = jnp.zeros_like(dws_ref)

        @pl.when(j == 0)
        def _():
            dqh_ref[:] = jnp.zeros_like(dqh_ref)

        v = v_ref[:]  # [TB, NB, C]
        dt = v.dtype
        C = v.shape[-1]
        Hb = wv_ref.shape[-1]  # this H chunk's width
        sub = min(128, Hb)
        v2 = v.reshape(tb * nb, C)
        r = r_ref[:] if normalize else None  # [TB, NB] f32 (fwd residual)
        ds = ds_ref[:]  # [TB, NB] f32

        for k in range(0, Hb, sub):
            # Hidden recompute for this H sub-slice (the matmul the
            # backward cannot avoid). Static lane-aligned slices
            # (k % 128 == 0).
            z = jnp.dot(v2, wv_ref[:, k:k + sub],
                        preferred_element_type=f32).reshape(tb, nb, sub)
            if normalize:
                z = z * r[:, :, None]
            z = z + qh_ref[:, k:k + sub].astype(f32)[:, None, :]
            h = jnp.maximum(z, 0.0)
            ws_row = ws_ref[:1, k:k + sub].astype(f32)  # [1, sub]
            dz = jnp.where(z > 0.0,
                           ds[:, :, None] * ws_row[None, :, :], 0.0)

            dws_ref[:, k:k + sub] += jnp.broadcast_to(
                jnp.sum(ds[:, :, None] * h, axis=(0, 1))[None, :],
                (dws_ref.shape[0], sub))
            dqh_ref[:, k:k + sub] += jnp.sum(dz, axis=1)

            dz_r = dz * r[:, :, None] if normalize else dz
            dz_c = dz_r.astype(dt)
            # dwv += v^T (r dz): contract the row dim of both matrices.
            dwv_ref[:, k:k + sub] += jax.lax.dot_general(
                v2, dz_c.reshape(tb * nb, sub),
                (((0,), (0,)), ((), ())), preferred_element_type=f32)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "block_b",
                                             "block_n", "block_h",
                                             "normalize"))
def _attention_pallas_bwd(v, qh, wv, ws, ds, r, *,
                          interpret: bool, block_b: int = 8,
                          block_n: int = 128, block_h: int = 128,
                          normalize: bool = False):
    """Launch the fused backward. ``ds`` is the score cotangent
    alpha * (dalpha - S) computed outside in XLA (one bandwidth-bound
    pass over the grid); ``r`` is the per-cell rsqrt-norm residual from
    the forward ([B, N] f32; any array when ``normalize=False`` —
    unused). Returns (dqh, dwv, dws)."""
    B, N, C = v.shape
    H = qh.shape[-1]
    tb, nb = block_b, block_n
    hb = min(block_h, H)
    Bp, Np = _round_up(B, tb), _round_up(N, nb)
    pad2 = lambda x: x if x.shape == (Bp, Np) else jnp.pad(
        x, ((0, Bp - B), (0, Np - N)))
    vp = v if (Bp, Np) == (B, N) else jnp.pad(
        v, ((0, Bp - B), (0, Np - N), (0, 0)))
    qhp = qh if Bp == B else jnp.pad(qh, ((0, Bp - B), (0, 0)))
    # Padded cells/rows contribute nothing: their ds entries are zero
    # (alpha is zero there).
    dsp = pad2(ds.astype(jnp.float32))
    rp = pad2(r.astype(jnp.float32))

    Hp = _round_up(H, hb)
    wv_c = wv.astype(v.dtype)
    if Hp != H:
        wv_c = jnp.pad(wv_c, ((0, 0), (0, Hp - H)))
        qhp = jnp.pad(qhp, ((0, 0), (0, Hp - H)))
    ws_rows = jnp.broadcast_to(ws.astype(v.dtype)[None, :], (8, H))
    if Hp != H:  # padded ws columns are zero -> dz there is zero
        ws_rows = jnp.pad(ws_rows, ((0, 0), (0, Hp - H)))

    out_specs = [
        pl.BlockSpec((tb, hb), lambda hc, i, j: (i, hc),
                     memory_space=pltpu.VMEM),  # dqh
        pl.BlockSpec((C, hb), lambda hc, i, j: (0, hc),
                     memory_space=pltpu.VMEM),  # dwv
        pl.BlockSpec((8, hb), lambda hc, i, j: (0, hc),
                     memory_space=pltpu.VMEM),  # dws
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
        jax.ShapeDtypeStruct((C, Hp), jnp.float32),
        jax.ShapeDtypeStruct((8, Hp), jnp.float32),
    ]
    flops = 2 * Bp * Np * C * Hp * 2
    outs = pl.pallas_call(
        _make_bwd_kernel(tb, nb, hb, normalize),
        grid=(Hp // hb, Bp // tb, Np // nb),
        in_specs=[
            pl.BlockSpec((tb, nb, C), lambda hc, i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, hb), lambda hc, i, j: (i, hc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, hb), lambda hc, i, j: (0, hc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, hb), lambda hc, i, j: (0, hc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, nb), lambda hc, i, j: (i, j),
                         memory_space=pltpu.VMEM),  # ds
            pl.BlockSpec((tb, nb), lambda hc, i, j: (i, j),
                         memory_space=pltpu.VMEM),  # r
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=vp.size * vp.dtype.itemsize * (Hp // hb),
            transcendentals=0,
        ),
        interpret=interpret,
    )(vp, qhp, wv_c, ws_rows, dsp, rp)
    return outs[0][:B, :H], outs[1][:, :H], outs[2][0, :H]


def _attention_bwd_math(v, qh, wv, ws, alpha, vatt, g, ga,
                        normalize: bool = False,
                        feature_grad: bool = True):
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
    # Recompute hidden activations (one MXU matmul). Scale-after-matmul
    # when normalizing — the convention every forward path uses
    # (_reference_postscaled / Pallas) — so the relu mask below matches
    # the primal's bit-for-bit away from reassociation noise.
    if normalize:
        z = jnp.einsum("bnc,ch->bnh", v_raw, wv.astype(dt),
                       preferred_element_type=f32, precision=hi) * r
    else:
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
    if not feature_grad:
        # Grid features are data (feature store) or frozen (end2end with
        # a stop_gradient backbone): skip the two [B, N, C]-sized dv
        # matmuls explicitly instead of trusting XLA DCE.
        return (jnp.zeros_like(v_raw), dqh, dwv.astype(wv.dtype),
                dws.astype(ws.dtype))
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
                normalize: bool, kernel: bool, bwd_kernel: bool,
                feature_grad: bool):
    """custom_vjp-wrapped attention. ``kernel`` picks the forward (Pallas
    streaming kernel vs XLA-fused oracle); ``bwd_kernel`` picks the
    backward (fused one-grid-pass Pallas kernel vs explicit jnp math).
    Either backward beats XLA autodiff, which would run the two big
    backward dots (dv, dwv) in f32 because the cotangents are f32, at 1/4
    the MXU's bf16 rate (profiled: 1.9 ms for dwv alone at B=256).

    ``feature_grad=False`` (valid ONLY when the grid features are data or
    sit behind stop_gradient — the precomputed-feature models, the frozen
    end2end backbone) skips the [B, N, C] dv matmul + write entirely and
    returns a zero cotangent for v."""

    @jax.custom_vjp
    def fused(v, qh, wv, ws):
        if kernel:
            out = _attention_pallas_fwd(v, qh, wv, ws, interpret=interpret,
                                        block_b=block_b, block_n=block_n,
                                        normalize=normalize)
            return tuple(out)
        if normalize:
            # Scale-AFTER-matmul, matching the Pallas kernels (forward and
            # backward): h = (v @ Wv) * r, v_att = sum (alpha r) v.
            # Mathematically identical to l2_normalize(v) @ Wv but rounds
            # identically to the kernels, so the relu mask in the kernel
            # backward agrees with this primal at z ~ 0 (mask flips from
            # convention mismatch showed up as ~0.1% scattered dqh error);
            # also cheaper: the scale touches [B, N, H], not [B, N, C].
            return _reference_postscaled(v, qh, wv, ws)
        return spatial_attention_reference(v, qh, wv, ws)

    def fwd(v, qh, wv, ws):
        vatt, alpha = fused(v, qh, wv, ws)
        r = None
        if bwd_kernel and not feature_grad and normalize:
            # Per-cell rsqrt norm, saved for the backward kernel ([B, N]
            # f32, 4 bytes/cell). On the XLA training forward this fuses
            # with (CSEs against) the primal's own normalization pass, so
            # it costs no extra HBM traffic; recomputing it inside the
            # backward kernel would blow the VMEM stack (a [TB, NB, C]
            # f32 square temp).
            r = jax.lax.rsqrt(
                jnp.sum(jnp.square(v.astype(jnp.float32)), axis=-1)
                + 1e-12)
        return (vatt, alpha), (v, qh, wv, ws, alpha, vatt, r)

    def bwd(residuals, cotangents):
        v, qh, wv, ws, alpha, vatt, r = residuals
        g, ga = cotangents
        if not bwd_kernel or feature_grad:
            # Default path. The Pallas backward below is kept as a
            # measured-and-rejected option: in the real train step it is
            # ~2 ms/step SLOWER than this explicit jnp backward (A/B at
            # batch 256 on v5e: 10.40 vs 8.41 ms/step), because it
            # re-fetches the v grid once per 128-wide H chunk while XLA
            # fuses the backward dots over fewer grid reads.
            return _attention_bwd_math(v, qh, wv, ws, alpha, vatt, g, ga,
                                       normalize=normalize,
                                       feature_grad=feature_grad)
        f32 = jnp.float32
        # Score cotangent in XLA (ONE bandwidth-bound pass over the
        # grid — the batched matvec g . v): dalpha_n = g . v_hat_n + ga_n;
        # S_b = g_b . vatt_b + sum_n alpha_bn ga_bn (residuals only,
        # exploiting sum_n alpha_n (g . v_n) = g . vatt);
        # ds = alpha * (dalpha - S).
        ga_f = ga.astype(f32)
        alpha_f = alpha.astype(f32)
        dalpha = jnp.einsum("bc,bnc->bn", g.astype(v.dtype), v,
                            preferred_element_type=f32)
        if r is not None:
            dalpha = dalpha * r
        dalpha = dalpha + ga_f
        s = (jnp.einsum("bc,bc->b", g.astype(f32), vatt.astype(f32),
                        preferred_element_type=f32)
             + jnp.sum(alpha_f * ga_f, axis=1))
        ds = alpha_f * (dalpha - s[:, None])
        if r is None:  # normalize=False: kernel never reads it
            r = jnp.ones(alpha.shape, f32)
        dqh, dwv, dws = _attention_pallas_bwd(
            v, qh, wv, ws, ds, r,
            interpret=interpret, block_b=block_b, block_n=block_n,
            normalize=normalize)
        return (jnp.zeros_like(v), dqh.astype(qh.dtype),
                dwv.astype(wv.dtype), dws.astype(ws.dtype))

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
    bwd_kernel: bool | None = None,
    feature_grad: bool = True,
    interpret: bool | None = None,
    block_b: int = 8,
    block_n: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatching entrypoint. ``normalize=True`` fuses per-cell L2
    normalization of ``v`` into the op (in-VMEM on the Pallas path).
    ``use_pallas`` picks the forward implementation; the explicit bf16
    backward applies to both unless ``custom_grad=False`` (pure autodiff,
    kept for gradient cross-checks). ``bwd_kernel`` (default False: the
    explicit jnp backward measured faster in the real train step — see
    ``_make_fused.bwd``) selects the fused one-grid-pass Pallas backward;
    ``feature_grad=False`` skips the dv computation for callers whose grid
    features need no gradient (data / frozen backbone) — ONLY safe then.
    ``interpret=None`` auto-selects interpreter mode off-TPU so tests
    exercise the kernel path on CPU."""
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
    if bwd_kernel is None:
        # Default OFF: the explicit jnp backward measured faster in the
        # real train step (see _make_fused.bwd); the kernel remains
        # available for shapes where one-pass grid reads win (e.g. much
        # larger N grids).
        bwd_kernel = False
    return _make_fused(interpret, block_b, block_n, normalize,
                       use_pallas, bwd_kernel,
                       feature_grad)(v, qh, wv, w_score)
