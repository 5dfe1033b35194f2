"""TPU-first GRU question encoder (reference C8/C9: GloVe->GRU over <=26-token
padded questions).

Design (SURVEY.md section 7, hard part (c)): the reference runs a TF1
``GRUCell`` step per token inside the graph. On TPU the right shape is to
hoist the input projection out of the recurrence — one big MXU matmul
``[B*T, D] @ [D, 3H]`` for all timesteps — and keep only the small
``h @ Uh [H,3H]`` matmul + elementwise gates inside ``lax.scan``. Gate
convention is the CuDNN/cuDNN-GRU variant (reset gate applied after the
hidden matmul), which is what allows the hidden projection to stay fused:

    r = sigmoid(x W_r + h U_r + b_r)
    z = sigmoid(x W_z + h U_z + b_z)
    n = tanh  (x W_n + r * (h U_n + b_hn) + b_n)
    h' = (1 - z) * n + z * h

Padded positions (id == <pad> -> mask 0) leave the carry unchanged, so the
final carry equals the state at each row's true length — no gather needed.
A fully-fused Pallas sequence kernel (``gru_fused``) runs the whole
recurrence in ONE kernel launch — the hidden state lives in VMEM scratch
across the T grid steps — with a matching BPTT backward kernel that walks
the grid in reverse. At B=256, T=26, H=512 the XLA scan pays per-iteration
launch overhead that dwarfs the 0.4-GFLOP step matmul; the fused kernel
removes it.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Dtype = Any


class GRUEncoder(nn.Module):
    """Masked GRU over a padded [B, T, D] sequence; returns final state [B, H].

    ``unroll`` trades compile time for fewer scan iterations. Default -1
    fully unrolls: questions are <=26 steps and on TPU the full unroll lets
    XLA schedule BPTT without loop overhead (measured 2.3 -> 1.8 ms
    fwd+bwd at B=256, H=512 on v5e).
    """

    hidden: int = 512
    dtype: Dtype = jnp.bfloat16
    unroll: int = 4  # scan-path unroll (full unroll compiles slowly)
    reverse: bool = False
    # Fused Pallas recurrence (prefix masks; reverse runs through the
    # same forward kernel on per-row time-reversed inputs). The scan path
    # remains as the fallback.
    use_pallas: bool = True
    # x arrives [T, B, D] instead of [B, T, D] (mask stays [B, T]). The
    # recurrence consumes time-major anyway; a caller that can PRODUCE
    # time-major (e.g. embedding-lookup of transposed token ids — indices
    # are 26 KB, activations 4 MB) skips this layer's input transpose AND
    # hands its own backward a time-major cotangent, killing the
    # gather-output copy + the dwords relayout ahead of the embedding
    # scatter (profiled ~0.03 ms/step at B=256, BASELINE.md step tail).
    time_major: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        if self.time_major:
            T, B, D = x.shape
        else:
            B, T, D = x.shape
        H = self.hidden
        kinit = nn.initializers.glorot_uniform()

        wx = self.param("wx", kinit, (D, 3 * H), jnp.float32)
        uh = self.param("uh", kinit, (H, 3 * H), jnp.float32)
        b = self.param("b", nn.initializers.zeros, (3 * H,), jnp.float32)
        bhn = self.param("bhn", nn.initializers.zeros, (H,), jnp.float32)

        dt = self.dtype
        x = x.astype(dt)
        # Hoisted input projection, TIME-MAJOR: transpose the cheap
        # [B, T, D] bf16 input (D=300) BEFORE the matmul so gx is born
        # [T, B, 3H] — the layout both the Pallas recurrence and the scan
        # consume. Producing gx batch-major and swapping after cost a
        # 0.057 ms/step f32 [*, 3H] relayout copy on v5e (profiled
        # copy_bitcast_fusion.2), and the backward paid a second one for
        # dgx (copy.195, 0.067 ms) — both gone in this layout; the dx/dWx
        # matmuls contract over T*B and never need batch-major.
        xt = x if self.time_major else jnp.swapaxes(x, 0, 1)  # [T, B, D]
        gx_t = jnp.dot(xt.reshape(T * B, D), wx.astype(dt),
                       preferred_element_type=jnp.float32)
        gx_t = (gx_t + b).reshape(T, B, 3 * H)

        if self.use_pallas:
            lens = jnp.sum(mask, axis=1).astype(jnp.int32)
            # reverse runs IN-KERNEL: the fused kernel walks the time
            # blocks in descending order under the same ``t < lens``
            # prefix mask — dead steps (t >= L) carry the zero initial
            # state through, then the live steps arrive in exactly
            # reversed order. An earlier version materialized per-row
            # time-reversed inputs (r_t = gx_{L-1-t}) with a
            # take_along_axis gather; at B=256 that moved ~41 MB per
            # direction (plus its scatter in the backward) and erased
            # most of the fused-kernel win for BiGRU (58.9k vs 83.2k
            # regions/s, BENCH_ALL_r05).
            hT = gru_fused(gx_t, lens, uh.astype(dt), bhn,
                           reverse=self.reverse)
            return hT.astype(dt)

        uh_c = uh.astype(dt)
        bhn_c = bhn

        def step(h: jnp.ndarray, inp: Tuple[jnp.ndarray, jnp.ndarray]):
            gx_t, m_t = inp  # [B, 3H] float32, [B] mask
            gh = jnp.dot(h.astype(dt), uh_c,
                         preferred_element_type=jnp.float32)  # [B, 3H]
            gx_r, gx_z, gx_n = jnp.split(gx_t, 3, axis=-1)
            gh_r, gh_z, gh_n = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(gx_r + gh_r)
            z = jax.nn.sigmoid(gx_z + gh_z)
            n = jnp.tanh(gx_n + r * (gh_n + bhn_c))
            h_new = (1.0 - z) * n + z * h
            m = m_t[:, None].astype(h_new.dtype)
            h_next = m * h_new + (1.0 - m) * h  # padded steps: carry through
            return h_next, None

        h0 = jnp.zeros((B, H), jnp.float32)
        mask_seq = jnp.swapaxes(mask, 0, 1)  # [T, B]
        unroll = T if self.unroll == -1 else self.unroll
        hT, _ = jax.lax.scan(step, h0, (gx_t, mask_seq),
                             unroll=unroll, reverse=self.reverse)
        return hT.astype(dt)


class _GRUParams(nn.Module):
    """Parameter-only scope matching :class:`GRUEncoder`'s tree exactly
    (same names, shapes, initializers, and scope path), so the fused
    bidirectional path below produces the identical checkpoint layout —
    and identical initial values — as two GRUEncoder submodules."""

    in_dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        kinit = nn.initializers.glorot_uniform()
        wx = self.param("wx", kinit, (self.in_dim, 3 * self.hidden),
                        jnp.float32)
        uh = self.param("uh", kinit, (self.hidden, 3 * self.hidden),
                        jnp.float32)
        b = self.param("b", nn.initializers.zeros, (3 * self.hidden,),
                       jnp.float32)
        bhn = self.param("bhn", nn.initializers.zeros, (self.hidden,),
                         jnp.float32)
        return wx, uh, b, bhn


class BiGRUEncoder(nn.Module):
    """Bidirectional variant: concat of forward/backward final states.

    ``time_major`` is forwarded to both directions (x [T, B, D], mask
    stays [B, T]) — a caller that looks up transposed token ids skips
    BOTH directions' input transposes (see GRUEncoder.time_major).

    ``fuse_directions`` (MEASURED AND REJECTED, default off) runs BOTH
    recurrences through ONE interleaved Pallas kernel (``bigru_fused``):
    each grid step advances the forward chain at t=k AND the backward
    chain at t=T-1-k, with one [T*B, D] x [D, 6H] matmul projecting both
    directions. On-chip A/B at the stage-1 description shape (B=256,
    H=256, T=26, dense CE): interleaved 1.7286 ms/step vs 1.5696 for the
    two per-direction kernels — the combined backward is time-IDENTICAL
    (0.3485 vs 0.350: Mosaic serializes the two chains inside the body,
    no MXU pipelining materializes) and the combined forward is WORSE
    (0.172 vs 0.127: two opposite-order block streams defeat the DMA
    prefetch, plus concat/slice fusions around the joint projection).
    Kept behind the flag with interpret-mode parity tests as the
    recorded experiment. Param tree is identical either way
    (``_GRUParams`` mirrors GRUEncoder's scope)."""

    hidden: int = 512
    dtype: Dtype = jnp.bfloat16
    unroll: int = 2
    time_major: bool = False
    use_pallas: bool = True
    fuse_directions: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        if not (self.use_pallas and self.fuse_directions):
            fwd = GRUEncoder(self.hidden, self.dtype, self.unroll,
                             use_pallas=self.use_pallas,
                             time_major=self.time_major, name="fwd")(x, mask)
            bwd = GRUEncoder(self.hidden, self.dtype, self.unroll,
                             use_pallas=self.use_pallas, reverse=True,
                             time_major=self.time_major, name="bwd")(x, mask)
            return jnp.concatenate([fwd, bwd], axis=-1)

        if self.time_major:
            T, B, D = x.shape
        else:
            B, T, D = x.shape
        H = self.hidden
        wxf, uhf, bf, bhnf = _GRUParams(D, H, name="fwd")()
        wxb, uhb, bb, bhnb = _GRUParams(D, H, name="bwd")()
        dt = self.dtype
        x = x.astype(dt)
        xt = x if self.time_major else jnp.swapaxes(x, 0, 1)  # [T, B, D]
        # One MXU matmul projects both directions ([D, 6H]).
        wx_cat = jnp.concatenate([wxf, wxb], axis=1).astype(dt)
        b_cat = jnp.concatenate([bf, bb])
        gx = jnp.dot(xt.reshape(T * B, D), wx_cat,
                     preferred_element_type=jnp.float32) + b_cat
        gx = gx.reshape(T, B, 6 * H)
        lens = jnp.sum(mask, axis=1).astype(jnp.int32)
        hTf, hTb = bigru_fused(gx[:, :, :3 * H], gx[:, :, 3 * H:], lens,
                               uhf.astype(dt), uhb.astype(dt), bhnf, bhnb)
        return jnp.concatenate([hTf, hTb], axis=-1).astype(dt)


# ---------------------------------------------------------------------------
# Fused Pallas sequence kernel
# ---------------------------------------------------------------------------


def _gru_fwd_kernel(gx_ref, lens_ref, uh_ref, bhn_ref,
                    hT_ref, hseq_ref, h_scr, *, reverse: bool):
    """One grid step = one timestep; hidden state persists in VMEM scratch.

    gx_ref (1, B, 3H) f32: precomputed x@Wx+b for step t;
    lens_ref (B, 128) i32 (column-broadcast lengths); uh_ref (H, 3H);
    bhn_ref (8, H) f32; outputs: hT (B, H) f32, hseq (1, B, H) f32 (the
    post-step states, saved as the backward residuals).

    ``reverse``: the index maps feed time blocks in DESCENDING order;
    the same ``t < lens`` prefix mask makes the padded steps (processed
    first) carry the zero state through, so no per-row input reversal is
    ever materialized. hseq[t] holds the post-step state of actual
    timestep t in both modes.
    """
    k = pl.program_id(0)
    last = pl.num_programs(0) - 1
    t = last - k if reverse else k  # actual timestep this block holds

    @pl.when(k == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    h_next = _gru_cell(gx_ref[0], h_scr[:], lens_ref, uh_ref, bhn_ref, t)
    h_scr[:] = h_next
    hseq_ref[0] = h_next

    @pl.when(k == last)
    def _():
        hT_ref[:] = h_scr[:]


def _gru_bwd_kernel(gx_ref, hprev_ref, lens_ref, uh_ref, uht_ref, bhn_ref,
                    ghT_ref, dgx_ref, duh_ref, dbhn_ref, dh_scr,
                    *, reverse: bool):
    """BPTT: grid step k walks the processing order backwards — timestep
    t = T-1-k for the forward recurrence, t = k for the reversed one
    (whose processing order is descending t, so its BPTT ascends).

    Recomputes the gates from gx_t and the pre-step state (one small
    matmul — cheaper than saving r/z/n), accumulates dUh/dbhn into
    resident output blocks, and writes dgx_t; dx/dWx/db are recovered
    outside by XLA matmuls.
    """
    k = pl.program_id(0)
    T = pl.num_programs(0)
    t = k if reverse else T - 1 - k

    @pl.when(k == 0)
    def _():
        dh_scr[:] = ghT_ref[:].astype(jnp.float32)
        duh_ref[:] = jnp.zeros_like(duh_ref)
        dbhn_ref[:] = jnp.zeros_like(dbhn_ref)

    # Pre-step state: hseq block at t-1 (forward) / t+1 (reverse); the
    # index map clamps at the boundary, where the first-processed step's
    # zero initial state is restored by the override below.
    h_prev = hprev_ref[0].astype(jnp.float32)
    first_processed = (t == T - 1) if reverse else (t == 0)
    h_prev = jnp.where(first_processed, 0.0, h_prev)

    dh_scr[:] = _gru_cell_bwd(gx_ref[0], h_prev, dh_scr[:], lens_ref,
                              uh_ref, uht_ref, bhn_ref, t,
                              dgx_ref, duh_ref, dbhn_ref)


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


@functools.partial(jax.jit, static_argnames=("interpret", "reverse"))
def _gru_pallas_fwd_call(gx_t, lens, uh, bhn, *, interpret: bool,
                         reverse: bool = False):
    """gx_t [T, B, 3H] f32 (time-major — the layout the kernel's per-step
    blocks want; batch-major input cost a profiled 0.057 ms relayout),
    lens [B] i32, uh [H, 3H], bhn [H] f32
    -> (hT [B, H] f32, hseq [T, B, H] f32). ``reverse`` feeds the time
    blocks in descending order (backward recurrence; no input gather)."""
    T, B, H3 = gx_t.shape
    H = H3 // 3
    Bp = _round8(B)
    if Bp != B:
        gx_t = jnp.pad(gx_t, ((0, 0), (0, Bp - B), (0, 0)))
        lens = jnp.pad(lens, (0, Bp - B))
    lens2d = jnp.broadcast_to(lens.astype(jnp.int32)[:, None], (Bp, 128))
    bhn_rows = jnp.broadcast_to(bhn.astype(jnp.float32)[None, :], (8, H))

    # Processing order: grid step k touches time block t=k (forward) or
    # t=T-1-k (reverse); hseq is written at the ACTUAL timestep's block.
    step_t = (lambda k: (T - 1 - k, 0, 0)) if reverse \
        else (lambda k: (k, 0, 0))
    hT, hseq = pl.pallas_call(
        functools.partial(_gru_fwd_kernel, reverse=reverse),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, Bp, H3), step_t,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, 128), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Bp, H), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, H), step_t,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Bp, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * Bp * H * H3, bytes_accessed=gx_t.size * 4,
            transcendentals=3 * T * Bp * H),
        interpret=interpret,
    )(gx_t, lens2d, uh, bhn_rows)
    return hT[:B], hseq[:, :B]


@functools.partial(jax.jit, static_argnames=("interpret", "reverse"))
def _gru_pallas_bwd_call(gx_t, hseq, lens, uh, bhn, ghT, *, interpret: bool,
                         reverse: bool = False):
    """BPTT -> (dgx_t [T, B, 3H] f32, duh [H, 3H] f32, dbhn [H]).
    Time-major in AND out: dgx_t feeds the dx/dWx matmuls, which contract
    over T*B and never need batch-major (returning [B, T, 3H] cost a
    profiled 0.067 ms relayout copy per step). ``reverse`` matches the
    forward call: BPTT walks the processing order backwards, so it
    ascends actual time and reads hseq[t+1] as the pre-step state."""
    T, B, H3 = gx_t.shape
    H = H3 // 3
    Bp = _round8(B)
    if Bp != B:
        gx_t = jnp.pad(gx_t, ((0, 0), (0, Bp - B), (0, 0)))
        hseq = jnp.pad(hseq, ((0, 0), (0, Bp - B), (0, 0)))
        lens = jnp.pad(lens, (0, Bp - B))
        ghT = jnp.pad(ghT, ((0, Bp - B), (0, 0)))
    lens2d = jnp.broadcast_to(lens.astype(jnp.int32)[:, None], (Bp, 128))
    bhn_rows = jnp.broadcast_to(bhn.astype(jnp.float32)[None, :], (8, H))
    uht = uh.T  # [3H, H]

    if reverse:
        rev = lambda k: (k, 0, 0)
        rev_prev = lambda k: (jnp.minimum(k + 1, T - 1), 0, 0)
    else:
        rev = lambda k: (T - 1 - k, 0, 0)
        rev_prev = lambda k: (jnp.maximum(T - 2 - k, 0), 0, 0)
    dgx, duh, dbhn = pl.pallas_call(
        functools.partial(_gru_bwd_kernel, reverse=reverse),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, Bp, H3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, H), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, 128), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H3, H), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, H), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, H), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Bp, H3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, H), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Bp, H3), jnp.float32),
            jax.ShapeDtypeStruct((H, H3), jnp.float32),
            jax.ShapeDtypeStruct((8, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Bp, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * T * Bp * H * H3, bytes_accessed=2 * gx_t.size * 4,
            transcendentals=3 * T * Bp * H),
        interpret=interpret,
    )(gx_t, hseq, lens2d, uh, uht, bhn_rows, ghT.astype(jnp.float32))
    return dgx[:, :B], duh, dbhn[0]


@functools.lru_cache(maxsize=None)
def _make_gru_fused(interpret: bool, reverse: bool):
    @jax.custom_vjp
    def fused(gx, lens, uh, bhn):
        hT, _ = _gru_pallas_fwd_call(gx, lens, uh, bhn,
                                     interpret=interpret, reverse=reverse)
        return hT

    def fwd(gx, lens, uh, bhn):
        hT, hseq = _gru_pallas_fwd_call(gx, lens, uh, bhn,
                                        interpret=interpret,
                                        reverse=reverse)
        return hT, (gx, hseq, lens, uh, bhn)

    def bwd(res, ghT):
        gx_t, hseq, lens, uh, bhn = res
        dgx_t, duh, dbhn = _gru_pallas_bwd_call(gx_t, hseq, lens, uh, bhn,
                                                ghT, interpret=interpret,
                                                reverse=reverse)
        return (dgx_t.astype(gx_t.dtype), None,
                duh.astype(uh.dtype), dbhn.astype(bhn.dtype))

    fused.defvjp(fwd, bwd)
    return fused


def gru_fused(gx_t: jnp.ndarray, lens: jnp.ndarray, uh: jnp.ndarray,
              bhn: jnp.ndarray, *, reverse: bool = False,
              interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused GRU recurrence: gx_t [T, B, 3H] TIME-MAJOR (= x@Wx + b —
    produce it in this layout; see GRUEncoder), lens [B] int32 true
    lengths (prefix masking), uh [H, 3H], bhn [H] -> final state
    [B, H] f32. Differentiable in gx_t/uh/bhn via the BPTT kernel.
    ``reverse`` runs the backward recurrence over each row's valid
    prefix entirely in-kernel (descending time blocks; no gather)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _make_gru_fused(interpret, reverse)(gx_t, lens, uh, bhn)


# ---------------------------------------------------------------------------
# Interleaved bidirectional kernel (BiGRUEncoder's fused path)
# ---------------------------------------------------------------------------


def _gru_cell(gx, h, lens_ref, uh_ref, bhn_ref, t):
    """THE single-step cell math — the one copy shared by
    _gru_fwd_kernel (above) and _bigru_fwd_kernel (below)."""
    H = bhn_ref.shape[-1]
    gh = jnp.dot(h.astype(uh_ref.dtype), uh_ref[:],
                 preferred_element_type=jnp.float32)
    r = jax.nn.sigmoid(gx[:, :H] + gh[:, :H])
    z = jax.nn.sigmoid(gx[:, H:2 * H] + gh[:, H:2 * H])
    n = jnp.tanh(gx[:, 2 * H:] + r * (gh[:, 2 * H:] + bhn_ref[:][:1]))
    h_new = (1.0 - z) * n + z * h
    m = (t < lens_ref[:, :1]).astype(jnp.float32)
    return m * h_new + (1.0 - m) * h


def _bigru_fwd_kernel(gxf_ref, gxb_ref, lens_ref, uhf_ref, uhb_ref,
                      bhnf_ref, bhnb_ref, hTf_ref, hTb_ref,
                      hseqf_ref, hseqb_ref, hf_scr, hb_scr):
    """Grid step k advances the forward chain at t=k AND the backward
    chain at t=last-k — two independent recurrences whose small matmuls
    pipeline inside one kernel instead of across two serial launches."""
    k = pl.program_id(0)
    last = pl.num_programs(0) - 1

    @pl.when(k == 0)
    def _():
        hf_scr[:] = jnp.zeros_like(hf_scr)
        hb_scr[:] = jnp.zeros_like(hb_scr)

    hf = _gru_cell(gxf_ref[0], hf_scr[:], lens_ref, uhf_ref, bhnf_ref, k)
    hb = _gru_cell(gxb_ref[0], hb_scr[:], lens_ref, uhb_ref, bhnb_ref,
                   last - k)
    hf_scr[:] = hf
    hb_scr[:] = hb
    hseqf_ref[0] = hf
    hseqb_ref[0] = hb

    @pl.when(k == last)
    def _():
        hTf_ref[:] = hf_scr[:]
        hTb_ref[:] = hb_scr[:]


def _gru_cell_bwd(gx, h_prev, dh, lens_ref, uh_ref, uht_ref, bhn_ref, t,
                  dgx_ref, duh_ref, dbhn_ref):
    """THE single-step BPTT math — the one copy shared by
    _gru_bwd_kernel (above) and _bigru_bwd_kernel (below). Recomputes
    the gates from gx and the pre-step state (one small matmul — cheaper
    than saving r/z/n), writes this step's dgx slices (lane offsets
    0/H/2H are multiples of 128 for H >= 128), accumulates dUh
    (h_prev^T @ da_gate, contracting batch) and dbhn into resident
    output blocks, and returns dh for the pre-step state."""
    H = bhn_ref.shape[-1]
    gh = jnp.dot(h_prev.astype(uh_ref.dtype), uh_ref[:],
                 preferred_element_type=jnp.float32)
    gx_ = gx
    bhn = bhn_ref[:][:1]
    ghn_b = gh[:, 2 * H:] + bhn
    r = jax.nn.sigmoid(gx_[:, :H] + gh[:, :H])
    z = jax.nn.sigmoid(gx_[:, H:2 * H] + gh[:, H:2 * H])
    n = jnp.tanh(gx_[:, 2 * H:] + r * ghn_b)

    m = (t < lens_ref[:, :1]).astype(jnp.float32)
    dh_new = m * dh
    dh_prev = (1.0 - m) * dh + dh_new * z

    dz = dh_new * (h_prev - n)
    dn = dh_new * (1.0 - z)
    da_n = dn * (1.0 - n * n)
    dr = da_n * ghn_b
    dgh_n = da_n * r
    da_r = dr * r * (1.0 - r)
    da_z = dz * z * (1.0 - z)

    dgx_ref[0, :, :H] = da_r
    dgx_ref[0, :, H:2 * H] = da_z
    dgx_ref[0, :, 2 * H:] = da_n

    dh_prev = dh_prev + jnp.dot(
        da_r.astype(uht_ref.dtype), uht_ref[:H, :],
        preferred_element_type=jnp.float32)
    dh_prev = dh_prev + jnp.dot(
        da_z.astype(uht_ref.dtype), uht_ref[H:2 * H, :],
        preferred_element_type=jnp.float32)
    dh_prev = dh_prev + jnp.dot(
        dgh_n.astype(uht_ref.dtype), uht_ref[2 * H:, :],
        preferred_element_type=jnp.float32)

    hp = h_prev.astype(uh_ref.dtype)
    dims = (((0,), (0,)), ((), ()))
    duh_ref[:, :H] += jax.lax.dot_general(
        hp, da_r.astype(hp.dtype), dims, preferred_element_type=jnp.float32)
    duh_ref[:, H:2 * H] += jax.lax.dot_general(
        hp, da_z.astype(hp.dtype), dims, preferred_element_type=jnp.float32)
    duh_ref[:, 2 * H:] += jax.lax.dot_general(
        hp, dgh_n.astype(hp.dtype), dims,
        preferred_element_type=jnp.float32)
    dbhn_ref[:] += jnp.broadcast_to(
        jnp.sum(dgh_n, axis=0, keepdims=True), dbhn_ref.shape)
    return dh_prev


def _bigru_bwd_kernel(gxf_ref, gxb_ref, hpf_ref, hpb_ref, lens_ref,
                      uhf_ref, uhtf_ref, uhb_ref, uhtb_ref,
                      bhnf_ref, bhnb_ref, ghTf_ref, ghTb_ref,
                      dgxf_ref, dgxb_ref, duhf_ref, duhb_ref,
                      dbhnf_ref, dbhnb_ref, dhf_scr, dhb_scr):
    """Both BPTTs per grid step: the forward chain's walks descending
    actual time (t = T-1-k, pre-step state hseqf[t-1]) while the
    backward chain's ascends (t = k, pre-step state hseqb[t+1])."""
    k = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(k == 0)
    def _():
        dhf_scr[:] = ghTf_ref[:].astype(jnp.float32)
        dhb_scr[:] = ghTb_ref[:].astype(jnp.float32)
        duhf_ref[:] = jnp.zeros_like(duhf_ref)
        duhb_ref[:] = jnp.zeros_like(duhb_ref)
        dbhnf_ref[:] = jnp.zeros_like(dbhnf_ref)
        dbhnb_ref[:] = jnp.zeros_like(dbhnb_ref)

    tf_ = T - 1 - k
    hpf = jnp.where(tf_ == 0, 0.0, hpf_ref[0].astype(jnp.float32))
    dhf_scr[:] = _gru_cell_bwd(gxf_ref[0], hpf, dhf_scr[:], lens_ref,
                               uhf_ref, uhtf_ref, bhnf_ref, tf_,
                               dgxf_ref, duhf_ref, dbhnf_ref)

    tb = k
    hpb = jnp.where(tb == T - 1, 0.0, hpb_ref[0].astype(jnp.float32))
    dhb_scr[:] = _gru_cell_bwd(gxb_ref[0], hpb, dhb_scr[:], lens_ref,
                               uhb_ref, uhtb_ref, bhnb_ref, tb,
                               dgxb_ref, duhb_ref, dbhnb_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bigru_pallas_fwd_call(gxf, gxb, lens, uhf, uhb, bhnf, bhnb, *,
                           interpret: bool):
    T, B, H3 = gxf.shape
    H = H3 // 3
    Bp = _round8(B)
    if Bp != B:
        gxf = jnp.pad(gxf, ((0, 0), (0, Bp - B), (0, 0)))
        gxb = jnp.pad(gxb, ((0, 0), (0, Bp - B), (0, 0)))
        lens = jnp.pad(lens, (0, Bp - B))
    lens2d = jnp.broadcast_to(lens.astype(jnp.int32)[:, None], (Bp, 128))
    bhnf_r = jnp.broadcast_to(bhnf.astype(jnp.float32)[None, :], (8, H))
    bhnb_r = jnp.broadcast_to(bhnb.astype(jnp.float32)[None, :], (8, H))

    fwd_t = lambda k: (k, 0, 0)
    bwd_t = lambda k: (T - 1 - k, 0, 0)
    const2 = lambda k: (0, 0)
    hTf, hTb, hseqf, hseqb = pl.pallas_call(
        _bigru_fwd_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, Bp, H3), fwd_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, H3), bwd_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, 128), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, H), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Bp, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, H), fwd_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, H), bwd_t, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Bp, H), jnp.float32),
                        pltpu.VMEM((Bp, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * T * Bp * H * H3,
            bytes_accessed=(gxf.size + gxb.size) * 4,
            transcendentals=6 * T * Bp * H),
        interpret=interpret,
    )(gxf, gxb, lens2d, uhf, uhb, bhnf_r, bhnb_r)
    return hTf[:B], hTb[:B], hseqf[:, :B], hseqb[:, :B]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bigru_pallas_bwd_call(gxf, gxb, hseqf, hseqb, lens, uhf, uhb,
                           bhnf, bhnb, ghTf, ghTb, *, interpret: bool):
    T, B, H3 = gxf.shape
    H = H3 // 3
    Bp = _round8(B)
    if Bp != B:
        pad3 = ((0, 0), (0, Bp - B), (0, 0))
        gxf, gxb = jnp.pad(gxf, pad3), jnp.pad(gxb, pad3)
        hseqf, hseqb = jnp.pad(hseqf, pad3), jnp.pad(hseqb, pad3)
        lens = jnp.pad(lens, (0, Bp - B))
        ghTf = jnp.pad(ghTf, ((0, Bp - B), (0, 0)))
        ghTb = jnp.pad(ghTb, ((0, Bp - B), (0, 0)))
    lens2d = jnp.broadcast_to(lens.astype(jnp.int32)[:, None], (Bp, 128))
    bhnf_r = jnp.broadcast_to(bhnf.astype(jnp.float32)[None, :], (8, H))
    bhnb_r = jnp.broadcast_to(bhnb.astype(jnp.float32)[None, :], (8, H))

    # fwd-chain BPTT descends t (blocks T-1-k); bwd-chain BPTT ascends.
    f_t = lambda k: (T - 1 - k, 0, 0)
    f_prev = lambda k: (jnp.maximum(T - 2 - k, 0), 0, 0)
    b_t = lambda k: (k, 0, 0)
    b_next = lambda k: (jnp.minimum(k + 1, T - 1), 0, 0)
    const2 = lambda k: (0, 0)
    dgxf, dgxb, duhf, duhb, dbhnf, dbhnb = pl.pallas_call(
        _bigru_bwd_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, Bp, H3), f_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, H3), b_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, H), f_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, H), b_next, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, 128), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H3, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H3, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, H), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Bp, H3), f_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, H3), b_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H3), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, H), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Bp, H3), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, H3), jnp.float32),
            jax.ShapeDtypeStruct((H, H3), jnp.float32),
            jax.ShapeDtypeStruct((H, H3), jnp.float32),
            jax.ShapeDtypeStruct((8, H), jnp.float32),
            jax.ShapeDtypeStruct((8, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Bp, H), jnp.float32),
                        pltpu.VMEM((Bp, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=12 * T * Bp * H * H3,
            bytes_accessed=2 * (gxf.size + gxb.size) * 4,
            transcendentals=6 * T * Bp * H),
        interpret=interpret,
    )(gxf, gxb, hseqf, hseqb, lens2d, uhf, uhf.T, uhb, uhb.T,
      bhnf_r, bhnb_r, ghTf.astype(jnp.float32), ghTb.astype(jnp.float32))
    return dgxf[:, :B], dgxb[:, :B], duhf, duhb, dbhnf[0], dbhnb[0]


@functools.lru_cache(maxsize=None)
def _make_bigru_fused(interpret: bool):
    @jax.custom_vjp
    def fused(gxf, gxb, lens, uhf, uhb, bhnf, bhnb):
        hTf, hTb, _, _ = _bigru_pallas_fwd_call(
            gxf, gxb, lens, uhf, uhb, bhnf, bhnb, interpret=interpret)
        return hTf, hTb

    def fwd(gxf, gxb, lens, uhf, uhb, bhnf, bhnb):
        hTf, hTb, hseqf, hseqb = _bigru_pallas_fwd_call(
            gxf, gxb, lens, uhf, uhb, bhnf, bhnb, interpret=interpret)
        return (hTf, hTb), (gxf, gxb, hseqf, hseqb, lens,
                            uhf, uhb, bhnf, bhnb)

    def bwd(res, g):
        gxf, gxb, hseqf, hseqb, lens, uhf, uhb, bhnf, bhnb = res
        ghTf, ghTb = g
        dgxf, dgxb, duhf, duhb, dbhnf, dbhnb = _bigru_pallas_bwd_call(
            gxf, gxb, hseqf, hseqb, lens, uhf, uhb, bhnf, bhnb,
            ghTf, ghTb, interpret=interpret)
        return (dgxf.astype(gxf.dtype), dgxb.astype(gxb.dtype), None,
                duhf.astype(uhf.dtype), duhb.astype(uhb.dtype),
                dbhnf.astype(bhnf.dtype), dbhnb.astype(bhnb.dtype))

    fused.defvjp(fwd, bwd)
    return fused


def bigru_fused(gxf: jnp.ndarray, gxb: jnp.ndarray, lens: jnp.ndarray,
                uhf: jnp.ndarray, uhb: jnp.ndarray, bhnf: jnp.ndarray,
                bhnb: jnp.ndarray, *,
                interpret: Optional[bool] = None) -> Tuple[jnp.ndarray,
                                                           jnp.ndarray]:
    """Interleaved bidirectional GRU: gxf/gxb [T, B, 3H] time-major
    per-direction input projections, lens [B] int32 -> (hT_fwd, hT_bwd)
    [B, H] f32 each. One kernel advances both chains per grid step (the
    backward chain in-kernel reversed, as gru_fused(reverse=True));
    BPTT likewise walks both chains per step. Differentiable in
    gxf/gxb/uh*/bhn*."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _make_bigru_fused(interpret)(gxf, gxb, lens, uhf, uhb,
                                        bhnf, bhnb)


class TFGRUEncoder(nn.Module):
    """TF1 ``tf.nn.rnn_cell.GRUCell``-exact variant (checkpoint fidelity).

    The reference builds its question encoder with the TF1 GRUCell
    (SURVEY.md C8/C9), whose gate math differs from the CuDNN convention
    used by :class:`GRUEncoder`: the reset gate multiplies the hidden state
    *before* the candidate matmul, and gates share one packed kernel over
    ``[x, h]`` with bias initialized to 1.0:

        r, z = sigmoid([x, h] @ W_g + b_g)          # b_g init 1.0
        c    = tanh([x, r*h] @ W_c + b_c)
        h'   = z*h + (1-z)*c

    Param names mirror TF1 variable names (``gates/kernel`` etc.) so ported
    reference weights drop in as a pure rename. Use this module when
    verifying logit-level agreement against reference checkpoints; use
    GRUEncoder for from-scratch TPU training (its candidate matmul fuses).
    """

    hidden: int = 512
    dtype: Dtype = jnp.bfloat16
    unroll: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        B, T, D = x.shape
        H = self.hidden
        kinit = nn.initializers.glorot_uniform()
        w_gates = self.param("gates_kernel", kinit, (D + H, 2 * H),
                             jnp.float32)
        b_gates = self.param("gates_bias", nn.initializers.ones,
                             (2 * H,), jnp.float32)
        w_cand = self.param("candidate_kernel", kinit, (D + H, H),
                            jnp.float32)
        b_cand = self.param("candidate_bias", nn.initializers.zeros,
                            (H,), jnp.float32)
        dt = self.dtype
        x = x.astype(dt)
        # The x-side of the gate matmul hoists; the h-side and the whole
        # candidate matmul are sequential (r*h sits inside it).
        gx = jnp.dot(x.reshape(B * T, D), w_gates[:D].astype(dt),
                     preferred_element_type=jnp.float32)
        gx = (gx + b_gates).reshape(B, T, 2 * H)
        cx = jnp.dot(x.reshape(B * T, D), w_cand[:D].astype(dt),
                     preferred_element_type=jnp.float32)
        cx = (cx + b_cand).reshape(B, T, H)
        w_gates_h = w_gates[D:].astype(dt)
        w_cand_h = w_cand[D:].astype(dt)

        def step(h, inp):
            gx_t, cx_t, m_t = inp
            gates = gx_t + jnp.dot(h.astype(dt), w_gates_h,
                                   preferred_element_type=jnp.float32)
            r = jax.nn.sigmoid(gates[:, :H])
            z = jax.nn.sigmoid(gates[:, H:])
            c = jnp.tanh(cx_t + jnp.dot((r * h).astype(dt), w_cand_h,
                                        preferred_element_type=jnp.float32))
            h_new = z * h + (1.0 - z) * c
            m = m_t[:, None].astype(h_new.dtype)
            return m * h_new + (1.0 - m) * h, None

        h0 = jnp.zeros((B, H), jnp.float32)
        hT, _ = jax.lax.scan(
            step, h0,
            (jnp.swapaxes(gx, 0, 1), jnp.swapaxes(cx, 0, 1),
             jnp.swapaxes(mask, 0, 1)),
            unroll=min(self.unroll if self.unroll > 0 else T, T))
        return hT.astype(dt)


def gru_reference(params: dict, x: jnp.ndarray, mask: jnp.ndarray,
                  hidden: int) -> jnp.ndarray:
    """Slow per-step float32 reference for numerics tests: identical math to
    :class:`GRUEncoder` but computed timestep-by-timestep in float32 with no
    hoisting, so tests catch any hoisting/masking bug."""
    wx, uh, b, bhn = (params["wx"], params["uh"], params["b"], params["bhn"])
    B, T, D = x.shape
    h = jnp.zeros((B, hidden), jnp.float32)
    for t in range(T):
        gx = x[:, t].astype(jnp.float32) @ wx + b
        gh = h @ uh
        gx_r, gx_z, gx_n = jnp.split(gx, 3, axis=-1)
        gh_r, gh_z, gh_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(gx_r + gh_r)
        z = jax.nn.sigmoid(gx_z + gh_z)
        n = jnp.tanh(gx_n + r * (gh_n + bhn))
        h_new = (1.0 - z) * n + z * h
        m = mask[:, t][:, None].astype(jnp.float32)
        h = m * h_new + (1.0 - m) * h
    return h
