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
