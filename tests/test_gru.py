"""GRU encoder numerics: fused/scan implementation vs per-step oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_transfer_externaldata_tpu.ops.gru import (
    BiGRUEncoder, GRUEncoder, gru_reference)


@pytest.fixture(scope="module")
def setup():
    B, T, D, H = 4, 7, 12, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    lengths = np.array([7, 3, 1, 5])
    mask = jnp.asarray(np.arange(T)[None, :] < lengths[:, None], jnp.float32)
    enc = GRUEncoder(hidden=H, dtype=jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x, mask)
    return enc, params, x, mask, lengths, H


def test_matches_per_step_oracle(setup):
    enc, params, x, mask, _, H = setup
    out = enc.apply(params, x, mask)
    ref = gru_reference(params["params"], x, mask, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_mask_freezes_carry(setup):
    """Changing inputs beyond a row's length must not change its output."""
    enc, params, x, mask, lengths, _ = setup
    out1 = enc.apply(params, x, mask)
    x2 = x.at[1, 3:].set(99.0)  # row 1 has length 3
    out2 = enc.apply(params, x2, mask)
    np.testing.assert_allclose(np.asarray(out1[1]), np.asarray(out2[1]),
                               rtol=1e-6, atol=1e-6)
    # sanity: an in-range change does alter the output
    x3 = x.at[1, 1].set(99.0)
    out3 = enc.apply(params, x3, mask)
    assert not np.allclose(np.asarray(out1[1]), np.asarray(out3[1]))


def test_final_state_equals_truncated_run(setup):
    """Carry at T equals running only the first `len` steps."""
    enc, params, x, mask, lengths, H = setup
    out = enc.apply(params, x, mask)
    row = 3
    L = int(lengths[row])
    short = enc.apply(params, x[row:row + 1, :L], mask[row:row + 1, :L])
    # tolerance is loose because the hoisted [B*T, D] matmul uses different
    # shapes (hence different XLA codegen) for the two runs
    np.testing.assert_allclose(np.asarray(out[row]), np.asarray(short[0]),
                               rtol=1e-2, atol=1e-3)


def test_gradients_flow(setup):
    enc, params, x, mask, _, _ = setup

    def loss(p):
        return jnp.sum(enc.apply(p, x, mask) ** 2)

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in flat)


def test_bigru_shape(setup):
    _, _, x, mask, _, H = setup
    enc = BiGRUEncoder(hidden=H, dtype=jnp.float32)
    params = enc.init(jax.random.PRNGKey(1), x, mask)
    out = enc.apply(params, x, mask)
    assert out.shape == (x.shape[0], 2 * H)


def test_bigru_fused_matches_two_encoder_fallback(setup):
    """The interleaved bidirectional kernel (ONE pallas_call advancing
    both chains per grid step; measured-and-rejected on-chip, kept
    behind fuse_directions) == the two-GRUEncoder scan fallback,
    fwd+grads, on the SAME params — the param trees are identical by
    construction (_GRUParams mirrors GRUEncoder's scope)."""
    _, _, x, mask, lengths, H = setup
    enc_fused = BiGRUEncoder(hidden=H, dtype=jnp.float32, use_pallas=True,
                             fuse_directions=True)
    enc_scan = BiGRUEncoder(hidden=H, dtype=jnp.float32, use_pallas=False)
    p_fused = enc_fused.init(jax.random.PRNGKey(1), x, mask)
    p_scan = enc_scan.init(jax.random.PRNGKey(1), x, mask)
    # identical trees AND identical init values (same scope paths)
    for a, b in zip(jax.tree_util.tree_leaves(p_fused),
                    jax.tree_util.tree_leaves(p_scan)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out_f = enc_fused.apply(p_fused, x, mask)
    out_s = enc_scan.apply(p_fused, x, mask)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                               rtol=1e-5, atol=1e-5)

    def loss(enc):
        return lambda p, x: jnp.sum(enc.apply(p, x, mask) ** 2)

    gf = jax.grad(loss(enc_fused), argnums=(0, 1))(p_fused, x)
    gs = jax.grad(loss(enc_scan), argnums=(0, 1))(p_fused, x)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
    # padding immunity through the fused path: junk past each row's
    # length must not change either direction's state
    x2 = x.at[1, 3:].set(77.0)  # row 1 has length 3
    o1 = enc_fused.apply(p_fused, x, mask)
    o2 = enc_fused.apply(p_fused, x2, mask)
    np.testing.assert_allclose(np.asarray(o1[1]), np.asarray(o2[1]),
                               rtol=1e-6, atol=1e-6)


def test_bigru_time_major_matches_batch_major(setup):
    """BiGRU time_major=True consumes [T, B, D] and must match the
    [B, T, D] path with the same params, fwd AND input grads (the desc
    model shares one transposed embedding lookup across both
    directions)."""
    _, _, x, mask, _, H = setup
    enc_bm = BiGRUEncoder(hidden=H, dtype=jnp.float32)
    enc_tm = BiGRUEncoder(hidden=H, dtype=jnp.float32, time_major=True)
    params = enc_bm.init(jax.random.PRNGKey(1), x, mask)
    x_tm = jnp.swapaxes(x, 0, 1)
    out_bm = enc_bm.apply(params, x, mask)
    out_tm = enc_tm.apply(params, x_tm, mask)
    np.testing.assert_allclose(np.asarray(out_tm), np.asarray(out_bm),
                               rtol=1e-6, atol=1e-6)

    g_bm = jax.grad(lambda xx: jnp.sum(enc_bm.apply(params, xx, mask) ** 2))(x)
    g_tm = jax.grad(
        lambda xx: jnp.sum(enc_tm.apply(params, xx, mask) ** 2))(x_tm)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(g_tm, 0, 1)),
                               np.asarray(g_bm), rtol=1e-5, atol=1e-5)


def test_pallas_matches_scan(setup):
    """Fused Pallas recurrence (interpret mode) == lax.scan path, fwd+grad."""
    _, params, x, mask, _, H = setup
    enc_p = GRUEncoder(hidden=H, dtype=jnp.float32, use_pallas=True)
    enc_s = GRUEncoder(hidden=H, dtype=jnp.float32, use_pallas=False)
    out_p = enc_p.apply(params, x, mask)
    out_s = enc_s.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s),
                               rtol=1e-5, atol=1e-5)

    def loss(enc):
        return lambda p, x: jnp.sum(enc.apply(p, x, mask) ** 2)

    gp = jax.grad(loss(enc_p), argnums=(0, 1))(params, x)
    gs = jax.grad(loss(enc_s), argnums=(0, 1))(params, x)
    for leaf_p, leaf_s in zip(jax.tree_util.tree_leaves(gp),
                              jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(leaf_p), np.asarray(leaf_s),
                                   rtol=1e-4, atol=1e-4)


def test_reverse_pallas_matches_scan(setup):
    """reverse=True through the fused kernel (in-kernel descending time
    blocks under the same prefix mask — no input gather) == the reverse
    scan, fwd+grad — this is BiGRU's backward direction, which used to
    fall off the fused path entirely."""
    _, params, x, mask, _, H = setup
    enc_p = GRUEncoder(hidden=H, dtype=jnp.float32, use_pallas=True,
                       reverse=True)
    enc_s = GRUEncoder(hidden=H, dtype=jnp.float32, use_pallas=False,
                       reverse=True)
    out_p = enc_p.apply(params, x, mask)
    out_s = enc_s.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s),
                               rtol=1e-5, atol=1e-5)
    # a reversed encoder is genuinely different from the forward one
    fwd = GRUEncoder(hidden=H, dtype=jnp.float32).apply(params, x, mask)
    assert not np.allclose(np.asarray(out_p), np.asarray(fwd))

    def loss(enc):
        return lambda p, x: jnp.sum(enc.apply(p, x, mask) ** 2)

    gp = jax.grad(loss(enc_p), argnums=(0, 1))(params, x)
    gs = jax.grad(loss(enc_s), argnums=(0, 1))(params, x)
    for leaf_p, leaf_s in zip(jax.tree_util.tree_leaves(gp),
                              jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(leaf_p), np.asarray(leaf_s),
                                   rtol=1e-4, atol=1e-4)


def test_reverse_pallas_ignores_padding(setup):
    """Per-row reversal must start at each row's own length: padding
    changes beyond L never reach the reversed prefix."""
    _, params, x, mask, lengths, H = setup
    enc = GRUEncoder(hidden=H, dtype=jnp.float32, use_pallas=True,
                     reverse=True)
    out1 = enc.apply(params, x, mask)
    x2 = x.at[1, 3:].set(99.0)  # row 1 has length 3
    out2 = enc.apply(params, x2, mask)
    np.testing.assert_allclose(np.asarray(out1[1]), np.asarray(out2[1]),
                               rtol=1e-6, atol=1e-6)
    # zero-length row stays zero state
    mask0 = mask.at[2, :].set(0.0)
    out0 = enc.apply(params, x, mask0)
    np.testing.assert_allclose(np.asarray(out0[2]), 0.0, atol=1e-6)


def test_bf16_close_to_f32(setup):
    enc_f32, params, x, mask, _, H = setup
    enc_bf16 = GRUEncoder(hidden=H, dtype=jnp.bfloat16)
    out32 = enc_f32.apply(params, x, mask)
    out16 = enc_bf16.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(out32),
                               np.asarray(out16, dtype=np.float32),
                               rtol=0.1, atol=0.05)


def test_time_major_matches_batch_major(setup):
    """time_major=True consumes [T, B, D] and must be bit-identical to
    the [B, T, D] path (same params — the flag only moves the input
    transpose out of the module; fwd AND input grads)."""
    enc, params, x, mask, _, H = setup
    tm = GRUEncoder(hidden=H, dtype=jnp.float32, time_major=True)
    out_b = enc.apply(params, x, mask)
    out_t = tm.apply(params, jnp.swapaxes(x, 0, 1), mask)
    np.testing.assert_array_equal(np.asarray(out_b), np.asarray(out_t))

    gb = jax.grad(lambda xx: enc.apply(params, xx, mask).sum())(x)
    gt = jax.grad(lambda xx: tm.apply(params, xx, mask).sum())(
        jnp.swapaxes(x, 0, 1))
    np.testing.assert_allclose(np.asarray(gb),
                               np.asarray(jnp.swapaxes(gt, 0, 1)),
                               rtol=1e-6, atol=1e-6)
