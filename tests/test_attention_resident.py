"""Gather-free resident attention == gather + spatial_attention."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vqa_transfer_externaldata_tpu.ops.attention import spatial_attention
from vqa_transfer_externaldata_tpu.ops.attention_resident import (
    pad_store_rows, spatial_attention_resident)


@pytest.fixture
def data():
    rng = np.random.default_rng(7)
    M, N, C, H, B = 6, 12, 128, 128, 16
    store = rng.normal(size=(M, N, C)).astype(np.float32)
    rows = rng.integers(0, M, size=B).astype(np.int32)
    qh = rng.normal(size=(B, H)).astype(np.float32)
    wv = (rng.normal(size=(C, H)) * 0.05).astype(np.float32)
    ws = (rng.normal(size=(H,)) * 0.1).astype(np.float32)
    return store, rows, qh, wv, ws, N


@pytest.mark.parametrize("normalize", [False, True])
def test_forward_matches_gathered(data, normalize):
    store, rows, qh, wv, ws, N = data
    padded = jnp.asarray(pad_store_rows(store))
    v = jnp.asarray(store)[rows]  # the gather the op eliminates
    va_ref, al_ref = spatial_attention(
        v, jnp.asarray(qh), jnp.asarray(wv), jnp.asarray(ws),
        normalize=normalize, use_pallas=False, feature_grad=False,
        interpret=True)
    va, al = spatial_attention_resident(
        padded, jnp.asarray(rows), jnp.asarray(qh), jnp.asarray(wv),
        jnp.asarray(ws), n_valid=N, normalize=normalize, interpret=True)
    np.testing.assert_allclose(np.asarray(va), np.asarray(va_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(al), np.asarray(al_ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("normalize", [False, True])
def test_grads_match_gathered(data, normalize):
    store, rows, qh, wv, ws, N = data
    padded = jnp.asarray(pad_store_rows(store))
    v = jnp.asarray(store)[rows]

    def loss_ref(qh, wv, ws):
        va, al = spatial_attention(
            v, qh, wv, ws, normalize=normalize, use_pallas=False,
            feature_grad=False, interpret=True)
        return jnp.sum(va ** 2) + jnp.sum(al ** 3)

    def loss_res(qh, wv, ws):
        va, al = spatial_attention_resident(
            padded, jnp.asarray(rows), qh, wv, ws, n_valid=N,
            normalize=normalize, interpret=True)
        return jnp.sum(va ** 2) + jnp.sum(al ** 3)

    args = (jnp.asarray(qh), jnp.asarray(wv), jnp.asarray(ws))
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    g_res = jax.grad(loss_res, argnums=(0, 1, 2))(*args)
    for name, a, b in zip(("dqh", "dwv", "dws"), g_res, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_store_cotangent_is_zero(data):
    store, rows, qh, wv, ws, N = data
    padded = jnp.asarray(pad_store_rows(store))

    def loss(padded):
        va, _ = spatial_attention_resident(
            padded, jnp.asarray(rows), jnp.asarray(qh), jnp.asarray(wv),
            jnp.asarray(ws), n_valid=N, normalize=True, interpret=True)
        return jnp.sum(va ** 2)

    g = jax.grad(loss)(padded)
    assert not np.asarray(g).any()


@pytest.mark.parametrize("normalize", [False, True])
def test_shard_map_matches_direct(data, normalize, eight_cpu_devices):
    """mesh/data_axis: the op under jax.shard_map (store replicated,
    rows/qh sharded, per-device B/8 grids, psum'd dwv/dws via the
    shard_map transpose) == the direct single-program op — forward AND
    gradients. This is the multi-chip execution contract
    (ops/attention_resident module docstring)."""
    store, rows, qh, wv, ws, N = data
    padded = jnp.asarray(pad_store_rows(store))
    mesh = jax.sharding.Mesh(np.array(eight_cpu_devices[:2]), ("data",))

    def loss(fn, qh, wv, ws):
        va, al = fn(qh, wv, ws)
        return jnp.sum(va ** 2) + jnp.sum(al ** 3)

    def direct(qh, wv, ws):
        return spatial_attention_resident(
            padded, jnp.asarray(rows), qh, wv, ws, n_valid=N,
            normalize=normalize, interpret=True)

    def sharded(qh, wv, ws):
        return spatial_attention_resident(
            padded, jnp.asarray(rows), qh, wv, ws, n_valid=N,
            normalize=normalize, interpret=True, mesh=mesh,
            data_axis="data")

    args = (jnp.asarray(qh), jnp.asarray(wv), jnp.asarray(ws))
    va_d, al_d = direct(*args)
    va_s, al_s = jax.jit(sharded)(*args)
    np.testing.assert_allclose(np.asarray(va_s), np.asarray(va_d),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(al_s), np.asarray(al_d),
                               rtol=1e-5, atol=1e-6)

    g_d = jax.grad(lambda *a: loss(direct, *a), argnums=(0, 1, 2))(*args)
    g_s = jax.jit(jax.grad(lambda *a: loss(sharded, *a),
                           argnums=(0, 1, 2)))(*args)
    for name, a, b in zip(("dqh", "dwv", "dws"), g_s, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_int8_store_exact_plumbing(data):
    """An int8 store whose codes ARE the values (integer-valued grid,
    scale 1) must match the float path exactly — forward and gradients.
    Pins every piece of the quantized plumbing (in-kernel cast, wv fold,
    v_att/dwv post-scales, cotangent pre-scale) with zero quantization
    error in the comparison."""
    _, rows, qh, wv, ws, N = data
    rng = np.random.default_rng(11)
    M = 6
    ints = rng.integers(-127, 128, size=(M, N, 128)).astype(np.float32)
    padded_f = jnp.asarray(pad_store_rows(ints))
    padded_q = jnp.asarray(pad_store_rows(ints.astype(np.int8)))
    assert padded_q.shape[1] % 32 == 0  # int8 sublane-tile padding

    def loss(va_al):
        va, al = va_al
        return jnp.sum(va ** 2) + jnp.sum(al ** 3)

    def f_float(qh, wv, ws):
        return spatial_attention_resident(
            padded_f, jnp.asarray(rows), qh, wv, ws,
            n_valid=N, normalize=False, interpret=True)

    def f_int8(qh, wv, ws):
        return spatial_attention_resident(
            padded_q, jnp.asarray(rows), qh, wv, ws,
            n_valid=N, normalize=False, interpret=True, store_scale=1.0)

    args = (jnp.asarray(qh), jnp.asarray(wv), jnp.asarray(ws))
    for a, b in zip(f_int8(*args), f_float(*args)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    g_f = jax.grad(lambda *a: loss(f_float(*a)), argnums=(0, 1, 2))(*args)
    g_q = jax.grad(lambda *a: loss(f_int8(*a)), argnums=(0, 1, 2))(*args)
    for name, a, b in zip(("dqh", "dwv", "dws"), g_q, g_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=name)


def test_int8_store_quantization_accuracy(data):
    """quantize_store on an L2-prenormalized store: the quantized op must
    track the float op within quantization noise (relative v_att error
    well under 1%, attention argmax mostly preserved)."""
    from vqa_transfer_externaldata_tpu.ops.attention_resident import (
        quantize_store)

    store, rows, qh, wv, ws, N = data
    g32 = store / np.sqrt(
        np.sum(store ** 2, axis=-1, keepdims=True) + 1e-12)
    q, scale = quantize_store(g32)
    assert q.dtype == np.int8 and 0 < scale < 1.0
    va_f, al_f = spatial_attention_resident(
        jnp.asarray(pad_store_rows(g32.astype(np.float32))),
        jnp.asarray(rows), jnp.asarray(qh), jnp.asarray(wv),
        jnp.asarray(ws), n_valid=N, normalize=False, interpret=True)
    va_q, al_q = spatial_attention_resident(
        jnp.asarray(pad_store_rows(q)), jnp.asarray(rows),
        jnp.asarray(qh), jnp.asarray(wv), jnp.asarray(ws),
        n_valid=N, normalize=False, interpret=True, store_scale=scale)
    rel = (np.linalg.norm(np.asarray(va_q) - np.asarray(va_f))
           / np.linalg.norm(np.asarray(va_f)))
    assert rel < 0.01, rel
    agree = (np.asarray(al_q).argmax(1) == np.asarray(al_f).argmax(1))
    assert agree.mean() >= 0.9, agree.mean()


def test_int8_store_under_shard_map(data, eight_cpu_devices):
    """Quantized store under the multi-chip execution contract: int8
    codes + store_scale through jax.shard_map (store replicated,
    rows/qh sharded) == the direct single-program quantized op —
    forward AND gradients. Pins that the scale folds (wv pre-scale,
    v_att/dwv post-scales, cotangent pre-scale) commute with the
    per-device B/n grids and the psum'd dwv/dws transpose."""
    from vqa_transfer_externaldata_tpu.ops.attention_resident import (
        quantize_store)

    store, rows, qh, wv, ws, N = data
    g32 = store / np.sqrt(
        np.sum(store ** 2, axis=-1, keepdims=True) + 1e-12)
    q, scale = quantize_store(g32)
    padded = jnp.asarray(pad_store_rows(q))
    mesh = jax.sharding.Mesh(np.array(eight_cpu_devices[:2]), ("data",))

    def loss(fn, qh, wv, ws):
        va, al = fn(qh, wv, ws)
        return jnp.sum(va ** 2) + jnp.sum(al ** 3)

    def direct(qh, wv, ws):
        return spatial_attention_resident(
            padded, jnp.asarray(rows), qh, wv, ws, n_valid=N,
            normalize=False, interpret=True, store_scale=scale)

    def sharded(qh, wv, ws):
        return spatial_attention_resident(
            padded, jnp.asarray(rows), qh, wv, ws, n_valid=N,
            normalize=False, interpret=True, store_scale=scale,
            mesh=mesh, data_axis="data")

    args = (jnp.asarray(qh), jnp.asarray(wv), jnp.asarray(ws))
    for name, a, b in zip(("v_att", "alpha"), jax.jit(sharded)(*args),
                          direct(*args)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=name)
    g_d = jax.grad(lambda *a: loss(direct, *a), argnums=(0, 1, 2))(*args)
    g_s = jax.jit(jax.grad(lambda *a: loss(sharded, *a),
                           argnums=(0, 1, 2)))(*args)
    for name, a, b in zip(("dqh", "dwv", "dws"), g_s, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_store_sharded_shard_map_matches_replicated(eight_cpu_devices):
    """store_sharded=True (the store's ROW axis partitioned P(data) over
    the mesh, per-shard LOCAL row indices) must be bit-identical to the
    replicated-store shard_map run with the corresponding global rows —
    forward AND gradients. This is the HBM-capacity multi-chip contract
    (config.train.store_sharded; each device holds M/n rows and computes
    exactly what it would with the full store)."""
    rng = np.random.default_rng(3)
    n_dev = 8
    M, N, C, H, B = 16, 8, 64, 32, 64  # 2 rows + 8 questions per device
    store = rng.normal(size=(M, N, C)).astype(np.float32)
    rps = M // n_dev
    # slot d (positions d*8:(d+1)*8, placed on device d by the P(data)
    # batch sharding) references only device d's rows — the layout the
    # trainer's per-shard samplers stage. Contiguous-block layout here
    # (global = d*rps + local) keeps the test free of the trainer's
    # round-robin permutation, which is its own (host-side) concern.
    rows_global = np.concatenate([
        rng.integers(d * rps, (d + 1) * rps, size=B // n_dev)
        for d in range(n_dev)]).astype(np.int32)
    rows_local = (rows_global % rps).astype(np.int32)
    qh = rng.normal(size=(B, H)).astype(np.float32)
    wv = (rng.normal(size=(C, H)) * 0.05).astype(np.float32)
    ws = (rng.normal(size=(H,)) * 0.1).astype(np.float32)
    mesh = jax.sharding.Mesh(
        np.array(eight_cpu_devices).reshape(n_dev, 1), ("data", "model"))

    def run(sharded):
        def f(qh, wv, ws):
            va, al = spatial_attention_resident(
                jnp.asarray(store),
                jnp.asarray(rows_local if sharded else rows_global),
                qh, wv, ws, n_valid=N, normalize=True, interpret=True,
                mesh=mesh, data_axis="data", store_sharded=sharded)
            return jnp.sum(va ** 2) + jnp.sum(al ** 3), (va, al)

        (loss, outs), grads = jax.value_and_grad(
            f, argnums=(0, 1, 2), has_aux=True)(
            jnp.asarray(qh), jnp.asarray(wv), jnp.asarray(ws))
        return jax.device_get((loss, outs, grads))

    loss_r, outs_r, grads_r = run(False)
    loss_s, outs_s, grads_s = run(True)
    np.testing.assert_allclose(loss_s, loss_r, rtol=1e-6)
    for name, a, b in zip(("v_att", "alpha"), outs_s, outs_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7, err_msg=name)
    for name, a, b in zip(("dqh", "dwv", "dws"), grads_s, grads_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7, err_msg=name)


# ---------------------------------------------------------------------------
# G-glimpse variant (w_score [H, G]) — same coverage as the G=1 path:
# forward/grads vs the gathered XLA oracle, shard_map contract, int8
# plumbing, and the G=1 degenerate-case equivalence.
# ---------------------------------------------------------------------------


@pytest.fixture
def multi_data():
    rng = np.random.default_rng(19)
    M, N, C, H, B, G = 6, 12, 128, 128, 16, 2
    store = rng.normal(size=(M, N, C)).astype(np.float32)
    rows = rng.integers(0, M, size=B).astype(np.int32)
    qh = rng.normal(size=(B, H)).astype(np.float32)
    wv = (rng.normal(size=(C, H)) * 0.05).astype(np.float32)
    ws_g = (rng.normal(size=(H, G)) * 0.1).astype(np.float32)
    return store, rows, qh, wv, ws_g, N


def _multi_oracle(store, rows, qh, wv, ws_g, normalize):
    """Gathered oracle: spatial_attention_multi over the (optionally
    L2-normalized) gathered batch — the XLA path the model uses when the
    resident op is off (models/vqa_attention.py glimpses>1 branch)."""
    from vqa_transfer_externaldata_tpu.ops.attention import (
        spatial_attention_multi)
    from vqa_transfer_externaldata_tpu.ops.layers import l2_normalize

    v = jnp.asarray(store)[jnp.asarray(rows)]
    vn = l2_normalize(v) if normalize else v
    return spatial_attention_multi(vn, qh, wv, ws_g)


@pytest.mark.parametrize("normalize", [False, True])
def test_multi_forward_matches_gathered(multi_data, normalize):
    store, rows, qh, wv, ws_g, N = multi_data
    va_ref, al_ref = _multi_oracle(store, rows, jnp.asarray(qh),
                                   jnp.asarray(wv), jnp.asarray(ws_g),
                                   normalize)
    va, al = spatial_attention_resident(
        jnp.asarray(pad_store_rows(store)), jnp.asarray(rows),
        jnp.asarray(qh), jnp.asarray(wv), jnp.asarray(ws_g),
        n_valid=N, normalize=normalize, interpret=True)
    assert va.shape == (rows.shape[0], 2 * store.shape[2])
    assert al.shape == (rows.shape[0], N, 2)
    np.testing.assert_allclose(np.asarray(va), np.asarray(va_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(al), np.asarray(al_ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("normalize", [False, True])
def test_multi_grads_match_gathered(multi_data, normalize):
    store, rows, qh, wv, ws_g, N = multi_data
    padded = jnp.asarray(pad_store_rows(store))

    def loss_ref(qh, wv, ws_g):
        va, al = _multi_oracle(store, rows, qh, wv, ws_g, normalize)
        return jnp.sum(va ** 2) + jnp.sum(al ** 3)

    def loss_res(qh, wv, ws_g):
        va, al = spatial_attention_resident(
            padded, jnp.asarray(rows), qh, wv, ws_g, n_valid=N,
            normalize=normalize, interpret=True)
        return jnp.sum(va ** 2) + jnp.sum(al ** 3)

    args = (jnp.asarray(qh), jnp.asarray(wv), jnp.asarray(ws_g))
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    g_res = jax.grad(loss_res, argnums=(0, 1, 2))(*args)
    for name, a, b in zip(("dqh", "dwv", "dws"), g_res, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_multi_g1_equals_single_glimpse(multi_data):
    """ws [H, 1] (multi kernels, G=1) must equal ws [H] (single kernels)
    exactly — forward AND gradients — pinning the two kernel families to
    each other on their shared math."""
    store, rows, qh, wv, ws_g, N = multi_data
    padded = jnp.asarray(pad_store_rows(store))
    ws1 = ws_g[:, :1]  # [H, 1]

    def run(ws, multi):
        def loss(qh, wv, ws):
            va, al = spatial_attention_resident(
                padded, jnp.asarray(rows), qh, wv, ws, n_valid=N,
                normalize=True, interpret=True)
            return jnp.sum(va ** 2) + jnp.sum(al ** 3), (va, al)

        args = (jnp.asarray(qh), jnp.asarray(wv), jnp.asarray(ws))
        (l, (va, al)), g = jax.value_and_grad(
            loss, argnums=(0, 1, 2), has_aux=True)(*args)
        if multi:  # [B, 1*C] / [B, N, 1] -> the single-glimpse layout
            va, al = va, al[:, :, 0]
            g = (g[0], g[1], g[2][:, 0])
        return jax.device_get((l, va, al, g))

    l1, va1, al1, g1 = run(ws_g[:, 0], multi=False)
    lm, vam, alm, gm = run(ws1, multi=True)
    np.testing.assert_array_equal(np.asarray(va1), np.asarray(vam))
    np.testing.assert_array_equal(np.asarray(al1), np.asarray(alm))
    np.testing.assert_allclose(l1, lm, rtol=0, atol=0)
    for name, a, b in zip(("dqh", "dwv", "dws"), gm, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7, err_msg=name)


def test_multi_store_cotangent_is_zero(multi_data):
    store, rows, qh, wv, ws_g, N = multi_data
    padded = jnp.asarray(pad_store_rows(store))

    def loss(padded):
        va, _ = spatial_attention_resident(
            padded, jnp.asarray(rows), jnp.asarray(qh), jnp.asarray(wv),
            jnp.asarray(ws_g), n_valid=N, normalize=True, interpret=True)
        return jnp.sum(va ** 2)

    g = jax.grad(loss)(padded)
    assert not np.asarray(g).any()


@pytest.mark.parametrize("normalize", [False, True])
def test_multi_shard_map_matches_direct(multi_data, normalize,
                                        eight_cpu_devices):
    """The G-glimpse op under jax.shard_map (store replicated, rows/qh
    sharded, psum'd dwv/dws) == the direct op — forward AND gradients,
    mirroring test_shard_map_matches_direct for the multi kernels."""
    store, rows, qh, wv, ws_g, N = multi_data
    padded = jnp.asarray(pad_store_rows(store))
    mesh = jax.sharding.Mesh(np.array(eight_cpu_devices[:2]), ("data",))

    def loss(fn, qh, wv, ws):
        va, al = fn(qh, wv, ws)
        return jnp.sum(va ** 2) + jnp.sum(al ** 3)

    def direct(qh, wv, ws):
        return spatial_attention_resident(
            padded, jnp.asarray(rows), qh, wv, ws, n_valid=N,
            normalize=normalize, interpret=True)

    def sharded(qh, wv, ws):
        return spatial_attention_resident(
            padded, jnp.asarray(rows), qh, wv, ws, n_valid=N,
            normalize=normalize, interpret=True, mesh=mesh,
            data_axis="data")

    args = (jnp.asarray(qh), jnp.asarray(wv), jnp.asarray(ws_g))
    va_d, al_d = direct(*args)
    va_s, al_s = jax.jit(sharded)(*args)
    np.testing.assert_allclose(np.asarray(va_s), np.asarray(va_d),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(al_s), np.asarray(al_d),
                               rtol=1e-5, atol=1e-6)
    g_d = jax.grad(lambda *a: loss(direct, *a), argnums=(0, 1, 2))(*args)
    g_s = jax.jit(jax.grad(lambda *a: loss(sharded, *a),
                           argnums=(0, 1, 2)))(*args)
    for name, a, b in zip(("dqh", "dwv", "dws"), g_s, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_multi_int8_store_exact_plumbing(multi_data):
    """Integer-valued store, scale 1: int8 codes through the G-glimpse
    kernels must match the float path exactly (fwd + grads) — pins the
    quantized plumbing (in-kernel cast, wv fold, v_att/dwv post-scales,
    cotangent pre-scale) for the multi variant."""
    _, rows, qh, wv, ws_g, N = multi_data
    rng = np.random.default_rng(23)
    ints = rng.integers(-127, 128, size=(6, N, 128)).astype(np.float32)
    padded_f = jnp.asarray(pad_store_rows(ints))
    padded_q = jnp.asarray(pad_store_rows(ints.astype(np.int8)))

    def loss(va_al):
        va, al = va_al
        return jnp.sum(va ** 2) + jnp.sum(al ** 3)

    def f_float(qh, wv, ws):
        return spatial_attention_resident(
            padded_f, jnp.asarray(rows), qh, wv, ws,
            n_valid=N, normalize=False, interpret=True)

    def f_int8(qh, wv, ws):
        return spatial_attention_resident(
            padded_q, jnp.asarray(rows), qh, wv, ws,
            n_valid=N, normalize=False, interpret=True, store_scale=1.0)

    args = (jnp.asarray(qh), jnp.asarray(wv), jnp.asarray(ws_g))
    for a, b in zip(f_int8(*args), f_float(*args)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    g_f = jax.grad(lambda *a: loss(f_float(*a)), argnums=(0, 1, 2))(*args)
    g_q = jax.grad(lambda *a: loss(f_int8(*a)), argnums=(0, 1, 2))(*args)
    for name, a, b in zip(("dqh", "dwv", "dws"), g_q, g_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=name)


def test_multi_int8_quantized_with_scale(multi_data):
    """quantize_store through the G-glimpse kernels (real scale != 1):
    tracks the float op within quantization noise, like the G=1 test."""
    from vqa_transfer_externaldata_tpu.ops.attention_resident import (
        quantize_store)

    store, rows, qh, wv, ws_g, N = multi_data
    g32 = store / np.sqrt(
        np.sum(store ** 2, axis=-1, keepdims=True) + 1e-12)
    q, scale = quantize_store(g32)
    va_f, al_f = spatial_attention_resident(
        jnp.asarray(pad_store_rows(g32.astype(np.float32))),
        jnp.asarray(rows), jnp.asarray(qh), jnp.asarray(wv),
        jnp.asarray(ws_g), n_valid=N, normalize=False, interpret=True)
    va_q, al_q = spatial_attention_resident(
        jnp.asarray(pad_store_rows(q)), jnp.asarray(rows),
        jnp.asarray(qh), jnp.asarray(wv), jnp.asarray(ws_g),
        n_valid=N, normalize=False, interpret=True, store_scale=scale)
    rel = (np.linalg.norm(np.asarray(va_q) - np.asarray(va_f))
           / np.linalg.norm(np.asarray(va_f)))
    assert rel < 0.01, rel
    agree = (np.asarray(al_q).argmax(1) == np.asarray(al_f).argmax(1))
    assert agree.mean() >= 0.9, agree.mean()


def test_multi_glimpse_limit_asserts(multi_data):
    """G > 8 exceeds the kernel's ws sublane window: the op must fail
    loudly at dispatch (and the trainer gate falls back before ever
    reaching it — tests/test_trainer.py)."""
    store, rows, qh, wv, _, N = multi_data
    ws_big = np.zeros((qh.shape[1], 9), np.float32)
    with pytest.raises(AssertionError, match="glimpses"):
        spatial_attention_resident(
            jnp.asarray(pad_store_rows(store)), jnp.asarray(rows),
            jnp.asarray(qh), jnp.asarray(wv), jnp.asarray(ws_big),
            n_valid=N, normalize=False, interpret=True)


def test_prenormalize_store_matches_naive_sequence():
    """The chunked one-pass prenormalize (+cast +pad +int8) must produce
    exactly what the naive full-copy sequence produced: normalize in f32
    (rsqrt(ssq+1e-12) convention), astype, pad_store_rows; and for int8,
    quantize_store of the normalized f32 array."""
    from vqa_transfer_externaldata_tpu.ops.attention_resident import (
        prenormalize_store, quantize_store)
    import ml_dtypes

    rng = np.random.default_rng(31)
    M, N, C = 7, 12, 64  # N%8 != 0: the pad matters
    grid = (rng.normal(size=(M, N, C)) * 3).astype(np.float16)
    g32 = np.asarray(grid, np.float32)
    ssq = np.sum(np.square(g32), axis=-1, keepdims=True)
    # multiply-by-reciprocal: the exact rounding the trainer's original
    # in-place pass produced (g32 *= 1/sqrt(...))
    g32n = g32 * (1.0 / np.sqrt(ssq + 1e-12))

    # exact path, f16 -> bf16 cast fused in (chunked: force tiny chunks)
    out, scale = prenormalize_store(grid, out_dtype=ml_dtypes.bfloat16,
                                    chunk_bytes=N * C * 4 * 2)
    assert scale == 1.0 and out.dtype == ml_dtypes.bfloat16
    want = pad_store_rows(g32n.astype(ml_dtypes.bfloat16))
    assert out.shape == want.shape
    np.testing.assert_array_equal(
        out.astype(np.float32), want.astype(np.float32))

    # no-cast path keeps the source dtype
    out2, _ = prenormalize_store(grid)
    assert out2.dtype == np.float16
    np.testing.assert_array_equal(out2, pad_store_rows(
        g32n.astype(np.float16)))

    # int8: identical codes and scale to quantize_store of the full
    # normalized array, padded to the int8 sublane tile
    q, s = prenormalize_store(grid, quantize="int8",
                              chunk_bytes=N * C * 4 * 2)
    q_want, s_want = quantize_store(g32n)
    assert s == s_want
    np.testing.assert_array_equal(q, pad_store_rows(q_want))
    assert q.shape[1] % 32 == 0


def test_prenormalize_store_never_mutates_source():
    """An f32 source must survive prenormalize_store untouched: the chunk
    slices alias the source under ``np.asarray``, and the original
    in-place normalize corrupted the caller's feature store (the trainer
    passes ``ds.store.grid`` directly — a dataset-owned, possibly
    read-only array). Pins f32 (aliasing dtype), the read-only case, and
    all three passes (plain / out_dtype / int8)."""
    from vqa_transfer_externaldata_tpu.ops.attention_resident import (
        prenormalize_store)
    import ml_dtypes

    rng = np.random.default_rng(7)
    M, N, C = 5, 12, 64
    grid = (rng.normal(size=(M, N, C)) * 3).astype(np.float32)
    orig = grid.copy()
    prenormalize_store(grid, chunk_bytes=N * C * 4 * 2)
    prenormalize_store(grid, out_dtype=ml_dtypes.bfloat16)
    prenormalize_store(grid, quantize="int8", chunk_bytes=N * C * 4 * 2)
    np.testing.assert_array_equal(grid, orig)

    grid.setflags(write=False)  # np.load(..., mmap_mode='r') analogue
    out, scale = prenormalize_store(grid)
    assert scale == 1.0 and out.shape[1] % 8 == 0
