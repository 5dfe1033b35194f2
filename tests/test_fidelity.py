"""Checkpoint-fidelity: TF1-exact GRU variant vs real TF execution, and the
fidelity diff tooling."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vqa_transfer_externaldata_tpu.ops.gru import TFGRUEncoder
from vqa_transfer_externaldata_tpu.utils import fidelity


def test_diff_trees_and_worst():
    a = {"w": np.ones((2, 2)), "b": np.zeros(3)}
    b = {"w": np.ones((2, 2)) * 1.001, "b": np.zeros(3)}
    rep = fidelity.diff_trees(a, b)
    assert rep["b"]["max_abs"] == 0.0
    assert abs(rep["w"]["max_abs"] - 0.001) < 1e-9
    name, worst = fidelity.worst_deviation(rep)
    assert name == "w"
    c = {"w": np.ones((2, 3))}
    rep2 = fidelity.diff_trees(a, c)
    assert "shape_mismatch" in rep2["w"] and "missing" in rep2["b"]


def test_logits_agree():
    f = lambda b: jnp.asarray(b)
    g = lambda b: jnp.asarray(b) + 1e-6
    ok, dev = fidelity.logits_agree(f, g, np.zeros((2, 4), np.float32))
    assert ok and dev <= 1.1e-6
    bad = lambda b: jnp.asarray(b) + 1.0
    ok, dev = fidelity.logits_agree(f, bad, np.zeros((2, 4), np.float32))
    assert not ok and abs(dev - 1.0) < 1e-9


def test_tf_gru_matches_real_tensorflow():
    """TFGRUEncoder must reproduce a real TF/Keras GRU (reset_after=False,
    the TF1 GRUCell math) bit-closely after a pure weight rename —
    SURVEY.md hard part (a): fidelity without the reference checkpoints."""
    tf = pytest.importorskip("tensorflow")

    B, T, D, H = 3, 5, 8, 16
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, D)).astype(np.float32)

    layer = tf.keras.layers.GRU(H, reset_after=False, return_state=True)
    _, h_tf = layer(tf.constant(x))
    kernel, rec_kernel, bias = [np.asarray(w) for w in layer.get_weights()]

    # Keras gate order is (z, r, h); TFGRUEncoder packs (r, z) + candidate.
    gates_kernel = np.zeros((D + H, 2 * H), np.float32)
    gates_kernel[:D, :H] = kernel[:, H:2 * H]      # r  <- keras r
    gates_kernel[:D, H:] = kernel[:, :H]           # z  <- keras z
    gates_kernel[D:, :H] = rec_kernel[:, H:2 * H]
    gates_kernel[D:, H:] = rec_kernel[:, :H]
    gates_bias = np.concatenate([bias[H:2 * H], bias[:H]])
    cand_kernel = np.concatenate([kernel[:, 2 * H:], rec_kernel[:, 2 * H:]])
    cand_bias = bias[2 * H:]

    params = {"params": {
        "gates_kernel": jnp.asarray(gates_kernel),
        "gates_bias": jnp.asarray(gates_bias),
        "candidate_kernel": jnp.asarray(cand_kernel),
        "candidate_bias": jnp.asarray(cand_bias),
    }}
    enc = TFGRUEncoder(hidden=H, dtype=jnp.float32)
    mask = jnp.ones((B, T), jnp.float32)
    h_jax = enc.apply(params, jnp.asarray(x), mask)
    np.testing.assert_allclose(np.asarray(h_jax), np.asarray(h_tf),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 3])
def test_fidelity_mode_full_forward_matches_numpy_oracle(seed):
    """SURVEY section 7 hard part (a), round-2 VERDICT item 4: ONE config
    (model.fidelity_mode) whose ENTIRE forward — embedding + TF1-exact GRU
    + normalized attention + gated fusion + cosine answer classifier — is
    pinned against an independent straight-line float64 numpy
    reimplementation that shares no code with the flax/Pallas stack. This
    assembled path is the drop-in target for ported reference weights."""
    from vqa_transfer_externaldata_tpu.config import Config
    from vqa_transfer_externaldata_tpu.models.zoo import build_model

    cfg = Config().replace_flat({
        "data.synthetic": True, "data.vocab_size": 96,
        "data.num_answers": 24, "data.grid_h": 3, "data.grid_w": 4,
        "data.feature_dim": 40, "data.max_question_len": 9,
        "model.model": "vqa_attention", "model.word_dim": 12,
        "model.rnn_dim": 20, "model.fusion_dim": 28,
        "model.att_hidden": 24, "model.answer_dim": 16,
        "model.fidelity_mode": True,
    })
    spec = build_model(cfg)
    assert spec.module.rnn_variant == "tf"
    assert spec.module.dtype == jnp.float32

    rng = np.random.default_rng(seed)
    B, N = 5, cfg.data.grid_h * cfg.data.grid_w
    features = rng.normal(size=(B, N, cfg.data.feature_dim)) \
        .astype(np.float32)
    q_ids = rng.integers(0, cfg.data.vocab_size,
                         size=(B, cfg.data.max_question_len)) \
        .astype(np.int32)
    q_ids[:, -2:] = 0  # exercise the <pad> masking
    variables = spec.module.init({"params": jax.random.PRNGKey(seed)},
                                 features, q_ids, train=False)
    # Break the fresh-init symmetry (zero biases, tiny tables) so the
    # comparison exercises non-degenerate activations everywhere.
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float64)
        + rng.normal(scale=0.05, size=x.shape), variables["params"])
    params_f32 = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), params)

    out = spec.module.apply({"params": params_f32}, features, q_ids,
                            train=False)
    got = np.asarray(out["logits"], np.float64)
    want = fidelity.reference_forward_numpy(params, features, q_ids)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_vlmap_full_forward_matches_numpy_oracle():
    """Stage-1 assembled-forward oracle: the f32 VLMapModel forward
    (dropout off) must match utils/fidelity.reference_vlmap_forward_numpy
    — an independent float64 straight-line reimplementation — at f32
    tolerance. Stage-1 counterpart of the fidelity_mode VQA oracle."""
    import jax
    import jax.numpy as jnp

    from vqa_transfer_externaldata_tpu.models.vlmap import VLMapModel
    from vqa_transfer_externaldata_tpu.utils.fidelity import (
        reference_vlmap_forward_numpy)

    rng = np.random.default_rng(5)
    B, C, V, K = 8, 64, 128, 16
    model = VLMapModel(vocab_size=V, num_tasks=8, feature_dim=C,
                       word_dim=32, task_dim=8, hidden_dim=48,
                       dropout=0.0, dtype=jnp.float32)
    feature = rng.normal(size=(B, C)).astype(np.float32)
    task = rng.integers(0, 8, size=B).astype(np.int32)
    candidates = rng.integers(0, V, size=(B, K)).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feature),
                           jnp.asarray(task), jnp.asarray(candidates))
    out = model.apply(variables, jnp.asarray(feature), jnp.asarray(task),
                      jnp.asarray(candidates))
    ref = reference_vlmap_forward_numpy(variables["params"], feature,
                                        task, candidates)
    np.testing.assert_allclose(np.asarray(out["logits"], np.float64), ref,
                               rtol=2e-5, atol=2e-5)


def test_vlmap_desc_full_forward_matches_numpy_oracle():
    """Description-variant assembled-forward oracle: the f32
    VLMapDescriptionModel forward (scan GRU path, dropout off) must match
    the independent float64 numpy reimplementation at f32 tolerance."""
    import jax
    import jax.numpy as jnp

    from vqa_transfer_externaldata_tpu.models.vlmap import (
        VLMapDescriptionModel)
    from vqa_transfer_externaldata_tpu.utils.fidelity import (
        reference_vlmap_desc_forward_numpy)

    rng = np.random.default_rng(6)
    B, C, V, K, T = 8, 48, 96, 12, 7
    model = VLMapDescriptionModel(vocab_size=V, num_tasks=6, feature_dim=C,
                                  word_dim=24, rnn_dim=16, task_dim=8,
                                  hidden_dim=40, dropout=0.0,
                                  dtype=jnp.float32, use_pallas=False)
    feature = rng.normal(size=(B, C)).astype(np.float32)
    desc = rng.integers(0, V, size=(B, T)).astype(np.int32)
    desc[:, 5:] = 0  # padded tail (PAD_ID=0) exercises the mask carry
    task = rng.integers(0, 6, size=B).astype(np.int32)
    candidates = rng.integers(0, V, size=(B, K)).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(feature),
                           jnp.asarray(desc), jnp.asarray(task),
                           jnp.asarray(candidates))
    out = model.apply(variables, jnp.asarray(feature), jnp.asarray(desc),
                      jnp.asarray(task), jnp.asarray(candidates))
    ref = reference_vlmap_desc_forward_numpy(
        variables["params"], feature, desc, task, candidates)
    np.testing.assert_allclose(np.asarray(out["logits"], np.float64), ref,
                               rtol=2e-5, atol=2e-5)
