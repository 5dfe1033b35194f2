"""Model zoo: init/forward shapes + loss semantics for every family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_transfer_externaldata_tpu.data.datasets import (
    load_dataset, synthetic_vlmap, synthetic_vqa)
from vqa_transfer_externaldata_tpu.models.zoo import build_model
from vqa_transfer_externaldata_tpu.models.vqa_attention import vqa_loss
from vqa_transfer_externaldata_tpu.utils.vocab import UNK_ID


@pytest.mark.parametrize("name", ["vqa_attention", "vqa_baseline", "vlmap",
                                  "vlmap_description"])
def test_forward_shapes(tiny_config, name):
    cfg = tiny_config.replace_flat({"model.model": name})
    spec = build_model(cfg)
    ds = load_dataset(cfg, "train", stage=spec.stage)
    batch = next(ds.batches(8, epochs=1, shuffle=False))
    params = spec.module.init({"params": jax.random.PRNGKey(0)},
                              *spec.inputs(batch), train=False)
    out = spec.module.apply(params, *spec.inputs(batch), train=False)
    expected_classes = (cfg.model.num_candidates
                        if name.startswith("vlmap")
                        else cfg.data.num_answers)
    assert out["logits"].shape == (8, expected_classes)
    loss, metrics = spec.loss(out, batch)
    assert np.isfinite(float(loss))
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0


def test_vlmap_variants_share_word_table_path(tiny_config):
    """Both stage-1 variants expose params/word_emb/embedding — the
    contract transfer_init relies on (either variant transfers)."""
    for name in ("vlmap", "vlmap_description"):
        cfg = tiny_config.replace_flat({"model.model": name})
        spec = build_model(cfg)
        ds = load_dataset(cfg, "train", stage=spec.stage)
        batch = next(ds.batches(4, epochs=1, shuffle=False))
        params = spec.module.init({"params": jax.random.PRNGKey(0)},
                                  *spec.inputs(batch), train=False)["params"]
        assert params["word_emb"]["embedding"].shape == (
            cfg.data.vocab_size, cfg.model.word_dim)


def test_word_init_is_used(tiny_config):
    cfg = tiny_config
    rng = np.random.default_rng(0)
    word_init = rng.normal(size=(cfg.data.vocab_size,
                                 cfg.model.word_dim)).astype(np.float32)
    spec = build_model(cfg.replace_flat({"model.model": "vqa_attention"}),
                       word_init=word_init)
    ds = load_dataset(cfg, "train")
    batch = next(ds.batches(4, epochs=1, shuffle=False))
    params = spec.module.init({"params": jax.random.PRNGKey(0)},
                              *spec.inputs(batch), train=False)
    stored = np.asarray(params["params"]["word_emb"]["embedding"])
    np.testing.assert_array_equal(stored, word_init)


def test_vqa_loss_masks_unk_answers(tiny_config):
    logits = jnp.zeros((4, 8))
    batch_all_unk = {"answer_id": jnp.full((4,), UNK_ID, jnp.int32)}
    loss, m = vqa_loss({"logits": logits}, batch_all_unk)
    assert float(loss) == 0.0  # every row masked out

    batch = {"answer_id": jnp.array([5, UNK_ID, 5, 5], jnp.int32)}
    logits2 = jnp.zeros((4, 8)).at[0, 5].set(100.0)
    _, m2 = vqa_loss({"logits": logits2}, batch)
    # only rows 0,2,3 count; row 0 correct -> acc 1/3
    assert abs(float(m2["accuracy"]) - 1 / 3) < 1e-6


def test_dropout_rng_changes_train_outputs(tiny_config):
    cfg = tiny_config.replace_flat({"model.model": "vqa_attention",
                                    "model.dropout": 0.5})
    spec = build_model(cfg)
    ds = load_dataset(cfg, "train")
    batch = next(ds.batches(4, epochs=1, shuffle=False))
    params = spec.module.init({"params": jax.random.PRNGKey(0)},
                              *spec.inputs(batch), train=False)
    o1 = spec.module.apply(params, *spec.inputs(batch), train=True,
                           rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = spec.module.apply(params, *spec.inputs(batch), train=True,
                           rngs={"dropout": jax.random.PRNGKey(2)})
    o3 = spec.module.apply(params, *spec.inputs(batch), train=False)
    assert not np.allclose(np.asarray(o1["logits"]), np.asarray(o2["logits"]))
    o3b = spec.module.apply(params, *spec.inputs(batch), train=False)
    np.testing.assert_array_equal(np.asarray(o3["logits"]),
                                  np.asarray(o3b["logits"]))


def test_synthetic_data_is_deterministic(tiny_config):
    a = synthetic_vqa(tiny_config, seed=7)
    b = synthetic_vqa(tiny_config, seed=7)
    for k in a.arrays:
        np.testing.assert_array_equal(a.arrays[k], b.arrays[k])
    c = synthetic_vlmap(tiny_config, seed=7)
    assert c.arrays["candidates"][
        np.arange(len(c)), c.arrays["label"]].min() >= 4


def test_bidirectional_description_encoder(tiny_config):
    """model.bidirectional_desc: the blank-fill variant's BiGRU encoder
    (ops/gru.BiGRUEncoder) — forward shape, finite loss, and the backward
    direction actually contributing (different output vs unidirectional)."""
    outs = {}
    for bidi in (False, True):
        cfg = tiny_config.replace_flat({
            "model.model": "vlmap_description",
            "model.bidirectional_desc": bidi,
            "model.dropout": 0.0, "model.dtype": "float32"})
        spec = build_model(cfg)
        ds = load_dataset(cfg, "train", stage=spec.stage)
        batch = next(ds.batches(8, epochs=1, shuffle=False))
        params = spec.module.init({"params": jax.random.PRNGKey(0)},
                                  *spec.inputs(batch), train=False)
        if bidi:
            enc = params["params"]["desc_bigru"]
            assert set(enc) == {"fwd", "bwd"}
        out = spec.module.apply(params, *spec.inputs(batch), train=False)
        assert out["logits"].shape == (8, cfg.model.num_candidates)
        loss, _ = spec.loss(out, batch)
        assert np.isfinite(float(loss))
        outs[bidi] = np.asarray(out["logits"])
    assert not np.allclose(outs[False], outs[True])


def test_attach_candidate_counts():
    """Counts carry with-replacement duplicates; word = candidates[label]."""
    from vqa_transfer_externaldata_tpu.data.datasets import (
        attach_candidate_counts)

    cand = np.array([[3, 3, 5, 0], [7, 1, 1, 1]], np.int32)
    label = np.array([2, 1], np.int32)
    out = attach_candidate_counts({"candidates": cand, "label": label}, 8)
    ref = np.zeros((2, 8), np.uint16)
    np.add.at(ref, (np.array([[0], [1]]), cand), 1)
    np.testing.assert_array_equal(out["cand_counts"], ref)
    assert out["cand_counts"][0, 3] == 2 and out["cand_counts"][1, 1] == 3
    np.testing.assert_array_equal(out["word"], [5, 1])
    # existing word column is preserved, counts overwritten
    out2 = attach_candidate_counts(
        {"candidates": cand, "label": label, "word": np.array([9, 9])}, 8)
    np.testing.assert_array_equal(out2["word"], [9, 9])


@pytest.mark.parametrize("name", ["vlmap", "vlmap_description"])
def test_dense_candidate_loss_matches_gather(tiny_config, name):
    """model.dense_candidate_loss: the count-weighted dense CE == the
    K-candidate gather CE — loss AND grads — including with-replacement
    DUPLICATE candidates (counts carry multiplicity, the exactness
    claim; models/vlmap._vlmap_dense_loss)."""
    from vqa_transfer_externaldata_tpu.data.datasets import (
        attach_candidate_counts)

    base_cfg = tiny_config.replace_flat({
        "model.model": name, "model.dropout": 0.0, "model.dtype": "float32"})
    spec_g = build_model(base_cfg)
    spec_d = build_model(base_cfg.replace_flat(
        {"model.dense_candidate_loss": True}))

    ds = load_dataset(base_cfg, "train", stage=spec_g.stage)
    batch = dict(next(ds.batches(8, epochs=1, shuffle=False)))
    # force duplicates: candidate 0 repeated, incl. a duplicate of the
    # positive word in row 1
    cand = np.asarray(batch["candidates"]).copy()
    cand[0, :3] = cand[0, 3]
    pos1 = cand[1, batch["label"][1]]
    cand[1, (batch["label"][1] + 1) % cand.shape[1]] = pos1
    batch["candidates"] = cand
    batch = attach_candidate_counts(batch, base_cfg.data.vocab_size)

    params = spec_g.module.init({"params": jax.random.PRNGKey(0)},
                                *spec_g.inputs(batch), train=False)

    def loss_fn(spec):
        def f(p):
            out = spec.module.apply(p, *spec.inputs(batch), train=True,
                                    rngs={"dropout": jax.random.PRNGKey(3)})
            return spec.loss(out, batch)[0]
        return f

    lg, gg = jax.value_and_grad(loss_fn(spec_g))(params)
    ld, gd = jax.value_and_grad(loss_fn(spec_d))(params)
    np.testing.assert_allclose(float(lg), float(ld), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gg),
                    jax.tree_util.tree_leaves(gd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    # eval (train=False) stays on the gathered [B, K] path even with the
    # flag on — deterministic stored candidate sets, index predictions
    out_eval = spec_d.module.apply(params, *spec_d.inputs(batch),
                                   train=False)
    assert "logits" in out_eval and "logits_vocab" not in out_eval


def test_dense_candidate_loss_trainer_parity(tiny_config, tmp_path):
    """One resident fit through the shared trainer in both loss modes on
    the identical stream: logged train losses agree (the dense mode's
    counts ride the resident upload like any other row array)."""
    import json

    from vqa_transfer_externaldata_tpu.parallel.trainer import Trainer

    losses = {}
    for dense in (False, True):
        cfg = tiny_config.replace_flat({
            "model.model": "vlmap", "model.dropout": 0.0,
            "model.dense_candidate_loss": dense,
            "train.max_steps": 20, "train.log_every": 10,
            "train.device_data_cache": True,
            "train.checkpoint_every": 10_000})
        spec = build_model(cfg)
        ds = load_dataset(cfg, "train", stage=spec.stage)
        train_dir = str(tmp_path / f"dense_{dense}")
        tr = Trainer(cfg, spec, train_dir=train_dir)
        state = tr.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
        tr.fit_resident(ds, state)
        tr.close()
        with open(f"{train_dir}/metrics.jsonl") as fh:
            losses[dense] = [json.loads(l)["train/loss"] for l in fh
                             if "train/loss" in l]
    assert losses[False] and len(losses[False]) == len(losses[True])
    np.testing.assert_allclose(losses[False], losses[True],
                               rtol=2e-4, atol=1e-5)


def test_dense_loss_grad_finite_with_extreme_noncandidate_logits():
    """Regression (round-5 review): a non-candidate logit sitting far
    above the candidate max must not NaN the backward — an outer-where
    guard alone zeroes the forward but still multiplies the (zero)
    cotangent by the inf exp primal. Also: an all-zero-count masked row
    must not send log(0)'s 0/0 through the VJP."""
    from vqa_transfer_externaldata_tpu.models.vlmap import _vlmap_dense_loss

    s = jnp.array([[-50.0, 45.0, -50.0, -49.0],
                   [1.0, 2.0, 3.0, 4.0]], jnp.float32)
    c = jnp.array([[1, 0, 2, 1], [0, 0, 0, 0]], jnp.float32)
    word = jnp.array([3, 0], jnp.int32)
    mask = jnp.array([1.0, 0.0], jnp.float32)  # row 1 is padding

    def f(s):
        return _vlmap_dense_loss(
            {"logits_vocab": s},
            {"cand_counts": c, "word": word, "example_mask": mask})[0]

    loss, g = jax.value_and_grad(f)(s)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(g)).all(), g
    # row-0 gradient equals the gather-path softmax gradient over the
    # candidate multiset {0, 2, 2, 3} (candidate 1 excluded)
    logits_k = jnp.array([s[0, 0], s[0, 2], s[0, 2], s[0, 3]])
    p = jax.nn.softmax(logits_k)
    expect = np.zeros(4, np.float32)
    expect[0], expect[2], expect[3] = p[0], p[1] + p[2], p[3] - 1.0
    np.testing.assert_allclose(np.asarray(g[0]), expect, rtol=1e-5,
                               atol=1e-7)
    # padded row contributes nothing
    np.testing.assert_allclose(np.asarray(g[1]), 0.0, atol=1e-8)
