"""Fused spatial-attention Pallas kernel vs jnp oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_transfer_externaldata_tpu.ops.attention import (
    spatial_attention, spatial_attention_reference)


@pytest.fixture(scope="module")
def data():
    B, N, C, H = 8, 196, 256, 64  # smaller C than prod (2048) for test speed
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    qh = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    wv = jnp.asarray(rng.normal(size=(C, H)) * 0.05, jnp.float32)
    ws = jnp.asarray(rng.normal(size=(H,)) * 0.1, jnp.float32)
    return v, qh, wv, ws


def test_reference_softmax_properties(data):
    v, qh, wv, ws = data
    v_att, alpha = spatial_attention_reference(v, qh, wv, ws)
    assert v_att.shape == (8, 256) and alpha.shape == (8, 196)
    np.testing.assert_allclose(np.asarray(alpha.sum(1)), 1.0, rtol=1e-5)
    assert (np.asarray(alpha) >= 0).all()


def test_pallas_matches_reference(data):
    v, qh, wv, ws = data
    ref_att, ref_alpha = spatial_attention_reference(v, qh, wv, ws)
    pal_att, pal_alpha = spatial_attention(v, qh, wv, ws, use_pallas=True,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(pal_alpha), np.asarray(ref_alpha),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pal_att), np.asarray(ref_att),
                               rtol=1e-4, atol=1e-4)


def test_pallas_matches_reference_bf16(data):
    v, qh, wv, ws = data
    v16 = v.astype(jnp.bfloat16)
    ref_att, _ = spatial_attention_reference(v16, qh, wv, ws)
    pal_att, _ = spatial_attention(v16, qh, wv, ws, interpret=True)
    np.testing.assert_allclose(np.asarray(pal_att), np.asarray(ref_att),
                               rtol=0.05, atol=0.05)


def test_pallas_odd_batch_block(data):
    v, qh, wv, ws = data
    v3, qh3 = v[:3], qh[:3]  # batch 3 -> block_b falls back to 3
    ref_att, _ = spatial_attention_reference(v3, qh3, wv, ws)
    pal_att, _ = spatial_attention(v3, qh3, wv, ws, interpret=True)
    np.testing.assert_allclose(np.asarray(pal_att), np.asarray(ref_att),
                               rtol=1e-4, atol=1e-4)


def test_custom_vjp_matches_reference_grad(data):
    v, qh, wv, ws = data

    def loss_pallas(v, qh, wv, ws):
        v_att, alpha = spatial_attention(v, qh, wv, ws, interpret=True)
        return jnp.sum(v_att ** 2) + jnp.sum(alpha * alpha)

    def loss_ref(v, qh, wv, ws):
        v_att, alpha = spatial_attention_reference(v, qh, wv, ws)
        return jnp.sum(v_att ** 2) + jnp.sum(alpha * alpha)

    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(v, qh, wv, ws)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(v, qh, wv, ws)
    for gp, gr in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4)


def test_xla_fwd_custom_grad_matches_autodiff(data):
    """use_pallas=False still carries the explicit bf16-friendly backward;
    it must match pure autodiff of the oracle."""
    v, qh, wv, ws = data

    def loss_custom(v, qh, wv, ws):
        v_att, alpha = spatial_attention(v, qh, wv, ws, use_pallas=False)
        return jnp.sum(v_att ** 2) + jnp.sum(alpha ** 3)

    def loss_auto(v, qh, wv, ws):
        v_att, alpha = spatial_attention(v, qh, wv, ws, use_pallas=False,
                                         custom_grad=False)
        return jnp.sum(v_att ** 2) + jnp.sum(alpha ** 3)

    g_c = jax.grad(loss_custom, argnums=(0, 1, 2, 3))(v, qh, wv, ws)
    g_a = jax.grad(loss_auto, argnums=(0, 1, 2, 3))(v, qh, wv, ws)
    for gc, ga_ in zip(g_c, g_a):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(ga_),
                                   rtol=1e-4, atol=1e-4)


def test_normalize_fused_matches_explicit(data):
    """normalize=True must equal l2_normalize outside the op, fwd + grad."""
    from vqa_transfer_externaldata_tpu.ops.layers import l2_normalize

    v, qh, wv, ws = data

    def loss_fused(v, qh, wv, ws):
        v_att, alpha = spatial_attention(v, qh, wv, ws, normalize=True,
                                         interpret=True)
        return jnp.sum(v_att ** 2) + jnp.sum(alpha ** 3)

    def loss_explicit(v, qh, wv, ws):
        v_att, alpha = spatial_attention_reference(l2_normalize(v), qh,
                                                   wv, ws)
        return jnp.sum(v_att ** 2) + jnp.sum(alpha ** 3)

    np.testing.assert_allclose(float(loss_fused(v, qh, wv, ws)),
                               float(loss_explicit(v, qh, wv, ws)),
                               rtol=1e-4)
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(v, qh, wv, ws)
    g_e = jax.grad(loss_explicit, argnums=(0, 1, 2, 3))(v, qh, wv, ws)
    for gf, ge in zip(g_f, g_e):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(ge),
                                   rtol=1e-3, atol=1e-5)


def test_attention_attends_to_salient_cell():
    """A cell whose feature aligns with the score weights should win."""
    B, N, C, H = 2, 16, 32, 8
    v = jnp.zeros((B, N, C)).at[:, 5, :].set(3.0)
    qh = jnp.zeros((B, H))
    wv = jnp.full((C, H), 0.1, jnp.float32)
    ws = jnp.full((H,), 1.0, jnp.float32)
    _, alpha = spatial_attention_reference(v, qh, wv, ws)
    assert int(np.asarray(alpha).argmax(1)[0]) == 5


def test_bwd_kernel_matches_jnp_backward(data):
    """The fused one-grid-pass Pallas backward (feature_grad=False: the
    hot path) == the explicit jnp backward on dqh/dwv/dws, for plain and
    normalized variants, with a loss that drives BOTH cotangents (v_att
    and alpha). dv is zero by contract on this path."""
    v, qh, wv, ws = data

    for normalize in (False, True):
        def loss(v, qh, wv, ws, *, bk):
            v_att, alpha = spatial_attention(
                v, qh, wv, ws, normalize=normalize, use_pallas=False,
                bwd_kernel=bk, feature_grad=not bk, interpret=True)
            return jnp.sum(v_att ** 2) + jnp.sum(alpha ** 3)

        g_k = jax.grad(lambda *a: loss(*a, bk=True),
                       argnums=(0, 1, 2, 3))(v, qh, wv, ws)
        g_j = jax.grad(lambda *a: loss(*a, bk=False),
                       argnums=(0, 1, 2, 3))(v, qh, wv, ws)
        assert not np.asarray(g_k[0]).any()  # feature_grad=False contract
        for gk, gj in zip(g_k[1:], g_j[1:]):
            np.testing.assert_allclose(np.asarray(gk), np.asarray(gj),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=f"normalize={normalize}")


def test_bwd_kernel_feature_grad_off(data):
    """feature_grad=False: dv is exactly zero (features are data), every
    other gradient identical to the feature_grad=True kernel path."""
    v, qh, wv, ws = data

    def loss(v, qh, wv, ws, *, fg):
        v_att, alpha = spatial_attention(
            v, qh, wv, ws, use_pallas=False, bwd_kernel=True,
            feature_grad=fg, interpret=True)
        return jnp.sum(v_att ** 2) + jnp.sum(alpha ** 3)

    g_on = jax.grad(lambda *a: loss(*a, fg=True),
                    argnums=(0, 1, 2, 3))(v, qh, wv, ws)
    g_off = jax.grad(lambda *a: loss(*a, fg=False),
                     argnums=(0, 1, 2, 3))(v, qh, wv, ws)
    assert not np.asarray(g_off[0]).any()
    for go, gf in zip(g_on[1:], g_off[1:]):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(go),
                                   rtol=1e-5, atol=1e-6)
