"""Gather-free spatial attention over a device-resident feature store.

The production hot path (reference C7/C8 data flow: questions join image
features by ``image_index``) materializes a [B, N, C] gathered batch every
step — profiled at ~1.1 ms of a 5.1 ms step on v5e (XLA's gather lowering
plus a layout copy, see parallel/trainer._prepare_resident). This op
removes the gather entirely: the attention kernels read each question's
grid row DIRECTLY from the [M, N, C] store in HBM via Mosaic scalar
prefetch (the canonical TPU embedding-lookup pattern — the per-question
``rows`` vector is prefetched to SMEM and the v-block index map points at
``rows[i]``), so grid features cross HBM exactly once in the forward and
once in the backward, with no [B, N, C] intermediate ever existing. The
grad-path forward saves the post-relu activations h [B, Np, H] (store
dtype; H << C) so the backward skips the v @ wv recompute — half its MXU
work; the no-grad primal (eval) never materializes h.

Shapes/limits: store [M, Np, C] with Np a multiple of 8 and C of 128
(``pad_store_rows`` pads the 196-cell grid to 200); B a multiple of 8.
The store is data by definition, so the op is feature_grad=False by
construction (zero/float0 cotangents for store/rows).

Math is identical to ops/attention.spatial_attention with
``normalize=True/False`` in the scale-after-matmul convention; parity is
tested against it in interpret mode and on hardware.

Multi-chip: pass ``mesh``/``data_axis`` and the op wraps itself in
``jax.shard_map`` over the data axis — each device runs its own
B/n-question grid against its full replicated store copy, which is the
canonical way to run a Mosaic custom call on a multi-chip mesh (GSPMD has
no partitioning rule for it and would otherwise replicate or fail to
compile the batch-sharded operands). The backward's dwv/dws are per-shard
partial sums; shard_map's transpose of the replicated ``P()`` inputs
inserts the cross-device psum automatically. The local batch B/n must be
a multiple of 8 (``parallel.trainer._prepare_resident`` gates the fused
mode off otherwise). Parity is pinned on the fake 8-device mesh at the
op level (fwd + grads,
tests/test_attention_resident.py::test_shard_map_matches_direct) and
through the trainer
(tests/test_trainer.py::test_resident_fused_attention_matches_gather);
the driver's multi-chip artifact runs it via
``__graft_entry__.dryrun_multichip``.

``store_sharded=True`` additionally partitions the store's ROW axis over
the data axis (``P(data)``) — the HBM-capacity mode, see
``spatial_attention_resident``'s docstring and ``train.store_sharded``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def pad_store_rows(grid: np.ndarray, multiple: int = 8) -> np.ndarray:
    """Pad the cell axis of an [M, N, C] store to a sublane multiple with
    zero rows (masked out by ``n_valid`` in the kernels). int8 stores pad
    to 32 (Mosaic's int8 sublane tile)."""
    M, N, C = grid.shape
    if grid.dtype == np.int8:
        multiple = max(multiple, 32)
    pad = (-N) % multiple
    if pad == 0:
        return grid
    return np.concatenate(
        [grid, np.zeros((M, pad, C), grid.dtype)], axis=1)


def prenormalize_store(grid: np.ndarray, out_dtype=None,
                       quantize: str = "",
                       chunk_bytes: int = 1 << 28
                       ) -> Tuple[np.ndarray, float]:
    """L2-prenormalize each cell of an [M, N, C] store and PAD the cell
    axis (``pad_store_rows``'s multiple) in ONE chunked pass: reads the
    (possibly mmapped f16) source once and writes the padded upload
    buffer once. The naive sequence — dtype cast, full-size float32 copy,
    normalize, cast back, pad-concatenate — is four full-store copies
    plus a 2x-width intermediate, measured at ~95 s/GB of wall on the
    bench host at realistic store sizes (8.8 GB store: ~13 min of prep
    before the first train step).

    ``quantize='int8'``: two chunked passes (global absmax of the
    normalized values, then code emission) — identical codes to
    ``quantize_store`` of the full normalized array, with no full-size
    f32 intermediate. Returns ``(padded store, scale)`` (scale 1.0 when
    not quantizing). Normalization math matches the kernels' f32
    ``rsqrt(ssq + 1e-12)`` convention exactly. The source is never
    mutated (``astype`` copies each chunk — an f32 source would alias
    under ``asarray`` and the in-place normalize would corrupt the
    caller's feature store; tests/test_attention_resident.py pins
    this)."""
    M, N, C = grid.shape
    rows = max(1, chunk_bytes // max(N * C * 4, 1))
    if quantize == "int8":
        gmax = 0.0
        for lo in range(0, M, rows):
            g32 = grid[lo:lo + rows].astype(np.float32)
            ssq = np.sum(np.square(g32), axis=-1, keepdims=True)
            g32 *= 1.0 / np.sqrt(ssq + 1e-12)
            gmax = max(gmax, float(np.max(np.abs(g32))))
        g = (gmax or 1.0) / 127.0
        Np = N + (-N) % 32  # int8 sublane tile (pad_store_rows)
        out = np.zeros((M, Np, C), np.int8)
        for lo in range(0, M, rows):
            g32 = grid[lo:lo + rows].astype(np.float32)
            ssq = np.sum(np.square(g32), axis=-1, keepdims=True)
            g32 *= 1.0 / np.sqrt(ssq + 1e-12)
            out[lo:lo + rows, :N] = np.clip(
                np.rint(g32 / g), -127, 127).astype(np.int8)
        return out, g
    Np = N + (-N) % 8
    out = np.zeros((M, Np, C), out_dtype or grid.dtype)
    for lo in range(0, M, rows):
        g32 = grid[lo:lo + rows].astype(np.float32)
        ssq = np.sum(np.square(g32), axis=-1, keepdims=True)
        g32 *= 1.0 / np.sqrt(ssq + 1e-12)
        out[lo:lo + rows, :N] = g32.astype(out.dtype)
    return out, 1.0


def quantize_store(grid: np.ndarray) -> Tuple[np.ndarray, float]:
    """Symmetric int8 quantization of an L2-prenormalized [M, N, C] store:
    one GLOBAL scale (after per-cell unit normalization every cell has the
    same norm, so component magnitudes are homogeneous across cells and a
    global scale loses nothing vs per-cell scales — which the Mosaic lane
    constraints make awkward to feed to the kernels). Returns
    ``(int8 store, g)`` with ``float(int8) * g ~= value``; ``g`` folds
    into ``wv`` / the ``v_att`` output outside the kernels
    (spatial_attention_resident ``store_scale``)."""
    g32 = np.asarray(grid, np.float32)
    gmax = float(np.max(np.abs(g32))) or 1.0
    g = gmax / 127.0
    q = np.clip(np.rint(g32 / g), -127, 127).astype(np.int8)
    return q, g


def _onehot8(k, dtype):
    """[8, 1] one-hot column for the in-window row index ``k``."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    return (idx == k).astype(dtype)


def _make_fwd_kernel_multi(n_valid: int, normalize: bool, save_h: bool,
                           glimpses: int):
    """G-glimpse forward: the dominant z = v @ wv matmul is computed ONCE
    and shared; each glimpse adds one [1,Np]x[Np,C] weighted-sum dot and a
    196-cell softmax (G independent softmaxes over the grid, the
    Show-Ask-Attend-Answer-style variant — ops/attention
    .spatial_attention_multi is the gathered/XLA oracle)."""

    def kernel(rows_ref, v_ref, qh_ref, wv_ref, ws_ref, *out_refs):
        del rows_ref
        G = glimpses
        vatt_refs = out_refs[:G]
        alpha_refs = out_refs[G:2 * G]
        i = pl.program_id(0)
        k = i % 8
        f32 = jnp.float32

        @pl.when(k == 0)
        def _():
            for g in range(G):
                vatt_refs[g][:] = jnp.zeros_like(vatt_refs[g])
                alpha_refs[g][:] = jnp.zeros_like(alpha_refs[g])

        v = v_ref[0]  # [Np, C]
        if v.dtype == jnp.int8:
            v = v.astype(wv_ref.dtype)
        dt = v.dtype
        Np = v.shape[0]
        z = jnp.dot(v, wv_ref[:], preferred_element_type=f32)  # [Np, H]
        if normalize:
            sq = jnp.sum(jnp.square(v), axis=-1, keepdims=True, dtype=f32)
            r = jax.lax.rsqrt(sq + 1e-12)  # [Np, 1]
            z = z * r
        qh_row = jax.lax.dot_general(
            _onehot8(k, qh_ref.dtype).reshape(1, 8), qh_ref[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=f32)  # [1, H]
        h = jnp.maximum(z + qh_row, 0.0)
        if save_h:
            out_refs[2 * G][0] = h.astype(out_refs[2 * G].dtype)
        idx = jax.lax.broadcasted_iota(jnp.int32, (Np, 1), 0)
        for g in range(G):  # static unroll; G is tiny (2 in practice)
            ws_row = ws_ref[g:g + 1].astype(f32)  # [1, H]
            s = jnp.sum(h * ws_row, axis=-1, keepdims=True)  # [Np, 1]
            s = jnp.where(idx < n_valid, s, _NEG_INF)
            m = jnp.max(s)
            p = jnp.exp(s - m)
            w = p / jnp.sum(p)  # [Np, 1] this glimpse's softmax
            pw = (w * r) if normalize else w
            vatt_row = jax.lax.dot_general(
                pw.astype(dt), v, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)  # [1, C]
            vatt_refs[g][0] += _onehot8(k, f32) * vatt_row
            alpha_refs[g][0] += _onehot8(k, f32) * w.reshape(1, Np)

    return kernel


def _make_bwd_kernel_multi(n_valid: int, normalize: bool, glimpses: int):
    """G-glimpse backward from the saved post-relu h (shared across
    glimpses — G=1 is simply this kernel unrolled once): per glimpse the softmax
    backward produces ds_g, all glimpses' dz accumulate into ONE
    [Np, H] cotangent so the dominant dwv = v^T dz matmul runs once."""

    def kernel(rows_ref, v_ref, h_ref, ws_ref, *refs):
        del rows_ref
        G = glimpses
        alpha_refs = refs[:G]
        g_refs = refs[G:2 * G]
        sga_refs = refs[2 * G:3 * G]
        dqh_ref, dwv_ref, dws_ref = refs[3 * G:]
        i = pl.program_id(0)
        k = i % 8
        f32 = jnp.float32

        @pl.when(i == 0)
        def _():
            dwv_ref[:] = jnp.zeros_like(dwv_ref)
            dws_ref[:] = jnp.zeros_like(dws_ref)

        @pl.when(k == 0)
        def _():
            dqh_ref[:] = jnp.zeros_like(dqh_ref)

        v = v_ref[0]  # [Np, C]
        if v.dtype == jnp.int8:
            v = v.astype(h_ref.dtype)
        dt = v.dtype
        Np = v.shape[0]
        onehot_row = _onehot8(k, dt).reshape(1, 8)
        onehot_f = _onehot8(k, f32).reshape(1, 8)
        if normalize:
            sq = jnp.sum(jnp.square(v), axis=-1, keepdims=True, dtype=f32)
            r = jax.lax.rsqrt(sq + 1e-12)  # [Np, 1]
        h = h_ref[0].astype(f32)  # [Np, H] saved relu(z + qh)
        dz = jnp.zeros(h.shape, f32)
        for g in range(G):  # static unroll
            g_row = jax.lax.dot_general(  # [1, C] cotangent of v_att_g
                onehot_row, g_refs[g][0], (((1,), (0,)), ((), ())),
                preferred_element_type=f32).astype(dt)
            alpha_row = jax.lax.dot_general(  # [1, Np]
                onehot_f, alpha_refs[g][0],
                (((1,), (0,)), ((), ())), preferred_element_type=f32)
            sga_row = jax.lax.dot_general(  # [1, Np]: ga_g + (-S_g)
                onehot_f, sga_refs[g][0],
                (((1,), (0,)), ((), ())), preferred_element_type=f32)
            dalpha = jax.lax.dot_general(
                g_row, v, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)  # [1, Np]
            if normalize:
                dalpha = dalpha * r.reshape(1, Np)
            ds = alpha_row * (dalpha + sga_row)  # [1, Np]
            ds_col = ds.reshape(Np, 1)
            ws_row = ws_ref[g:g + 1].astype(f32)  # [1, H]
            dz = dz + jnp.where(h > 0.0, ds_col * ws_row, 0.0)
            dws_ref[g:g + 1] += jnp.sum(ds_col * h, axis=0, keepdims=True)
        dqh_ref[0] += _onehot8(k, f32) * jnp.sum(dz, axis=0, keepdims=True)
        dz_r = dz * r if normalize else dz
        dwv_ref[:] += jax.lax.dot_general(
            v, dz_r.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=f32)  # [C, H]

    return kernel


def _check_shapes(store, rows, qh, interpret):
    M, Np, C = store.shape
    B = rows.shape[0]
    assert Np % 8 == 0, f"store cell axis {Np} must be a multiple of 8"
    if not interpret:  # Mosaic lane constraint; interpret mode is free
        assert C % 128 == 0, (
            f"store channel axis {C} must be a multiple of 128")
    assert B % 8 == 0, f"batch {B} must be a multiple of 8"
    return M, Np, C, B, qh.shape[-1]


@functools.partial(jax.jit,
                   static_argnames=("n_valid", "normalize", "interpret",
                                    "save_h", "store_scale"))
def _resident_fwd_multi(store, rows, qh, wv, ws, *, n_valid, normalize,
                        interpret, save_h=False, store_scale=1.0):
    """G-glimpse forward; ``ws`` is [H, G]. Returns (v_att [B, G*C] f32
    concat in glimpse order — matching spatial_attention_multi's
    reshape(B, G*C) — and alpha [B, Np, G] f32; padded cells sliced by
    the caller)."""
    M, Np, C, B, H = _check_shapes(store, rows, qh, interpret)
    G = ws.shape[1]
    assert G <= 8, f"glimpses {G} > 8 (the kernel's ws sublane window)"
    quant = jnp.issubdtype(store.dtype, jnp.integer)
    dt = qh.dtype if quant else store.dtype
    qh8 = qh.astype(jnp.float32).reshape(B // 8, 8, H)
    wv_c = (wv * store_scale).astype(dt) if store_scale != 1.0 \
        else wv.astype(dt)
    # Per-glimpse score rows padded to the 8-sublane block the kernel
    # static-slices (ws_ref[g:g+1]).
    ws_g8 = jnp.zeros((8, H), dt).at[:G].set(ws.T.astype(dt))
    out_specs = (
        [pl.BlockSpec((1, 8, C), lambda i, rows: (i // 8, 0, 0))
         for _ in range(G)]
        + [pl.BlockSpec((1, 8, Np), lambda i, rows: (i // 8, 0, 0))
           for _ in range(G)])
    out_shape = (
        [jax.ShapeDtypeStruct((B // 8, 8, C), jnp.float32)] * G
        + [jax.ShapeDtypeStruct((B // 8, 8, Np), jnp.float32)] * G)
    if save_h:
        out_specs.append(pl.BlockSpec((1, Np, H),
                                      lambda i, rows: (i, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, Np, H), dt))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Np, C), lambda i, rows: (rows[i], 0, 0)),
            pl.BlockSpec((1, 8, H), lambda i, rows: (i // 8, 0, 0)),
            pl.BlockSpec((C, H), lambda i, rows: (0, 0)),
            pl.BlockSpec((8, H), lambda i, rows: (0, 0)),
        ],
        out_specs=out_specs,
    )
    out = pl.pallas_call(
        _make_fwd_kernel_multi(n_valid, normalize, save_h, G),
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * C * (H + G),
            bytes_accessed=B * Np * C * store.dtype.itemsize,
            transcendentals=B * Np * G,
        ),
        interpret=interpret,
    )(rows.astype(jnp.int32), store, qh8, wv_c, ws_g8)
    vatt = jnp.concatenate([o.reshape(B, C) for o in out[:G]], axis=-1)
    if store_scale != 1.0:
        vatt = vatt * store_scale
    alpha = jnp.stack([o.reshape(B, Np) for o in out[G:2 * G]], axis=-1)
    ret = (vatt, alpha)
    return ret + (out[2 * G],) if save_h else ret


@functools.partial(jax.jit,
                   static_argnames=("n_valid", "normalize", "interpret",
                                    "store_scale"))
def _resident_bwd_multi(store, rows, h, ws, alpha, g, sga, *, n_valid,
                        normalize, interpret, store_scale=1.0):
    """Multi-glimpse backward from the shared saved ``h`` [B, Np, H].
    ``ws`` [H, G]; ``alpha``/``sga`` [B, Np, G] f32 (padded);
    ``g`` [B, G, C] f32 per-glimpse v_att cotangents. Returns
    (dqh [B, H], dwv [C, H], dws [H, G])."""
    M, Np, C = store.shape
    B = rows.shape[0]
    H = h.shape[-1]
    G = ws.shape[1]
    dt = h.dtype
    ws_g8 = jnp.zeros((8, H), dt).at[:G].set(ws.T.astype(dt))
    if store_scale != 1.0:
        g = g * store_scale
    al8 = [alpha[:, :, gi].reshape(B // 8, 8, Np) for gi in range(G)]
    g8 = [g[:, gi].astype(dt).reshape(B // 8, 8, C) for gi in range(G)]
    sga8 = [sga[:, :, gi].reshape(B // 8, 8, Np) for gi in range(G)]
    per_q = pl.BlockSpec((1, 8, Np), lambda i, rows: (i // 8, 0, 0))
    per_c = pl.BlockSpec((1, 8, C), lambda i, rows: (i // 8, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=(
            [pl.BlockSpec((1, Np, C), lambda i, rows: (rows[i], 0, 0)),
             pl.BlockSpec((1, Np, H), lambda i, rows: (i, 0, 0)),
             pl.BlockSpec((8, H), lambda i, rows: (0, 0))]
            + [per_q] * G + [per_c] * G + [per_q] * G),
        out_specs=[
            pl.BlockSpec((1, 8, H), lambda i, rows: (i // 8, 0, 0)),
            pl.BlockSpec((C, H), lambda i, rows: (0, 0)),
            pl.BlockSpec((8, H), lambda i, rows: (0, 0)),
        ],
    )
    dqh8, dwv, dws = pl.pallas_call(
        _make_bwd_kernel_multi(n_valid, normalize, G),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B // 8, 8, H), jnp.float32),
            jax.ShapeDtypeStruct((C, H), jnp.float32),
            jax.ShapeDtypeStruct((8, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * C * (H + G),
            bytes_accessed=B * Np * (C + H) * store.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rows.astype(jnp.int32), store, h, ws_g8, *al8, *g8, *sga8)
    if store_scale != 1.0:
        dwv = dwv * store_scale
    return dqh8.reshape(B, H), dwv, dws[:G].T


@functools.lru_cache(maxsize=None)
def _make_fused_multi(n_valid: int, normalize: bool, interpret: bool,
                      store_scale: float = 1.0):
    """custom_vjp wrapper of the G-glimpse kernels (``ws`` [H, G]);
    the ONLY fused wrapper (a 1-D ``w_score`` routes here with G=1) —
    shared saved-h residual, zero/float0 store cotangents, per-glimpse
    softmax-backward packing."""

    @jax.custom_vjp
    def fused(store, rows, qh, wv, ws):
        return _resident_fwd_multi(store, rows, qh, wv, ws,
                                   n_valid=n_valid, normalize=normalize,
                                   interpret=interpret,
                                   store_scale=store_scale)

    def fwd(store, rows, qh, wv, ws):
        vatt, alpha, h = _resident_fwd_multi(
            store, rows, qh, wv, ws, n_valid=n_valid,
            normalize=normalize, interpret=interpret, save_h=True,
            store_scale=store_scale)
        return (vatt, alpha), (store, rows, h, qh, wv, ws, alpha, vatt)

    def bwd(residuals, cotangents):
        store, rows, h, qh, wv, ws, alpha, vatt = residuals
        g, ga = cotangents  # g [B, G*C]; ga [B, Np, G]
        f32 = jnp.float32
        Np = store.shape[1]
        C = store.shape[2]
        B, _, G = alpha.shape
        g_f = g.astype(f32).reshape(B, G, C)
        vatt_f = vatt.astype(f32).reshape(B, G, C)
        ga_f = ga.astype(f32)
        alpha_f = alpha.astype(f32)
        # Per-glimpse S_b^g = g_g . vatt_g + sum_n alpha ga (true scale:
        # vatt is already dequantized; the kernel-side g pre-scale only
        # compensates its raw-code dalpha dot).
        s = (jnp.einsum("bgc,bgc->bg", g_f, vatt_f,
                        preferred_element_type=f32)
             + jnp.einsum("bng,bng->bg", alpha_f, ga_f,
                          preferred_element_type=f32))
        sga = ga_f - s[:, None, :]  # [B, Np, G] (alpha is already padded)
        dqh, dwv, dws = _resident_bwd_multi(
            store, rows, h, ws, alpha_f, g_f, sga,
            n_valid=n_valid, normalize=normalize, interpret=interpret,
            store_scale=store_scale)
        dstore = (np.zeros(store.shape, jax.dtypes.float0)
                  if jnp.issubdtype(store.dtype, jnp.integer)
                  else jnp.zeros_like(store))
        return (dstore,
                np.zeros(rows.shape, jax.dtypes.float0),
                dqh.astype(qh.dtype), dwv.astype(wv.dtype),
                dws.astype(ws.dtype))

    fused.defvjp(fwd, bwd)
    return fused


def spatial_attention_resident(
    store: jnp.ndarray,  # [M, Np, C] resident feature store (padded)
    rows: jnp.ndarray,  # [B] int32 store row per question
    qh: jnp.ndarray,  # [B, H] projected question
    wv: jnp.ndarray,  # [C, H]
    w_score: jnp.ndarray,  # [H]; or [H, G] for the G-glimpse variant
    *,
    n_valid: int,  # true cell count (<= Np; rest masked)
    normalize: bool = False,
    interpret: bool | None = None,
    store_scale: float = 1.0,
    mesh: Optional[jax.sharding.Mesh] = None,
    data_axis: Optional[str] = None,
    store_sharded: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather-free attention: returns (v_att [B, C] f32,
    alpha [B, n_valid] f32). A 2-D ``w_score`` [H, G] selects the
    G-glimpse variant (G independent softmaxes sharing the one v @ wv
    matmul): (v_att [B, G*C] f32 concat — spatial_attention_multi's
    layout — and alpha [B, n_valid, G]). Gradients flow to
    qh/wv/w_score only (the
    store is data). With ``mesh``/``data_axis`` (>1 device on the axis)
    the op runs under ``jax.shard_map``: store/wv/w_score replicated,
    rows/qh/outputs sharded on the data axis, each shard its own B/n
    grid (see module docstring).

    ``store_sharded``: the store's ROW axis is itself partitioned over
    the data axis (``P(data_axis)`` instead of replicated) — each device
    holds M/n contiguous rows and ``rows`` must already be LOCAL indices
    into that device's shard, with every question routed to the device
    owning its image (``parallel.trainer`` stages batches that way).
    This is the HBM-capacity mode: the aggregate store can be ~n times
    one chip's HBM (the real VQA v2 grid store is ~66 GB bf16 — far
    beyond one v5e — but 8.3 GB/chip sharded over a v5e-8). Compute and
    gradients are unchanged: each shard runs exactly the math it would
    run with a replicated store, and dwv/dws remain cross-shard psums
    from shard_map's transpose.

    ``store`` may be an int8 quantized store (``quantize_store`` of an
    L2-prenormalized grid) with its global ``store_scale``: HBM traffic
    for the dominant v reads halves, the kernels cast the codes in VMEM,
    and the scale is applied entirely outside the kernels (fold into wv,
    post-scale of v_att / dwv, pre-scale of the backward cotangent).
    Requires ``normalize=False`` (prenormalize before quantizing)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if jnp.issubdtype(store.dtype, jnp.integer):
        assert not normalize, \
            "int8 stores must be L2-prenormalized before quantization"
    # ONE kernel family: a 1-D w_score is the G-glimpse machinery with
    # G=1 (the unrolled kernel body is op-for-op what a dedicated G=1
    # kernel was — on-chip A/B'd at the production shape, BASELINE.md —
    # and a single implementation keeps softmax-backward/int8-fold fixes
    # in one place).
    multi = w_score.ndim == 2
    ws2 = w_score if multi else w_score[:, None]
    fused = _make_fused_multi(n_valid, normalize, interpret,
                              float(store_scale))
    if mesh is not None and data_axis is not None \
            and mesh.shape[data_axis] > 1:
        P = jax.sharding.PartitionSpec
        fused = jax.shard_map(
            fused, mesh=mesh,
            in_specs=(P(data_axis) if store_sharded else P(),
                      P(data_axis), P(data_axis), P(), P()),
            out_specs=(P(data_axis), P(data_axis)),
            # The body is a custom_vjp call; skip the varying-axes check
            # (the specs above state the replication contract explicitly).
            check_vma=False)
    v_att, alpha = fused(store, rows, qh, wv, ws2)
    # The primal returns alpha over the padded cell axis (the slice lives
    # outside the custom_vjp; its transpose zero-pads the cotangent,
    # matching the zero alpha of masked cells).
    alpha = alpha[:, :n_valid, :]
    if multi:
        return v_att, alpha
    return v_att, alpha[:, :, 0]
