"""Shared DP trainer: loss decrease, sharded==single-device, resume."""

import numpy as np
import jax
import pytest

from vqa_transfer_externaldata_tpu.data.datasets import load_dataset
from vqa_transfer_externaldata_tpu.models.zoo import build_model
from vqa_transfer_externaldata_tpu.parallel.mesh import create_mesh
from vqa_transfer_externaldata_tpu.parallel.trainer import Trainer


def _losses_from_jsonl(train_dir):
    import json, os

    path = os.path.join(train_dir, "metrics.jsonl")
    with open(path) as fh:
        return [json.loads(line)["train/loss"] for line in fh
                if "train/loss" in line]


@pytest.mark.parametrize("name", ["vqa_baseline", "vqa_attention", "vlmap"])
def test_loss_decreases(tiny_config, tmp_path, name, eight_cpu_devices):
    cfg = tiny_config.replace_flat({"model.model": name})
    spec = build_model(cfg)
    ds = load_dataset(cfg, "train", stage=spec.stage)
    trainer = Trainer(cfg, spec, train_dir=str(tmp_path / name))
    assert trainer.mesh.devices.size == 8  # full fake mesh in use
    example = next(ds.batches(1, epochs=1, shuffle=False))
    state = trainer.init_state(example)
    state = trainer.fit(ds.batches(cfg.train.batch_size), state,
                        max_steps=40)
    losses = _losses_from_jsonl(str(tmp_path / name))
    assert losses[-1] < losses[0] * 0.9, f"no learning: {losses}"
    trainer.close()


def test_sharded_equals_single_device(tiny_config, tmp_path,
                                      eight_cpu_devices):
    """The 8-way data-parallel step must match the 1-device step
    (SURVEY.md section 4's distributed test)."""
    cfg = tiny_config.replace_flat({"model.model": "vqa_baseline",
                                    "model.dropout": 0.0})
    spec = build_model(cfg)
    ds = load_dataset(cfg, "train", stage=spec.stage)

    def run(mesh_devices, tag):
        mesh = create_mesh(cfg, devices=mesh_devices)
        trainer = Trainer(cfg, spec, mesh=mesh,
                          train_dir=str(tmp_path / tag))
        state = trainer.init_state(
            next(ds.batches(1, epochs=1, shuffle=False)))
        state = trainer.fit(
            ds.batches(cfg.train.batch_size, seed=0), state, max_steps=5)
        trainer.close()
        return jax.device_get(state.params)

    p8 = run(eight_cpu_devices, "mesh8")
    p1 = run(eight_cpu_devices[:1], "mesh1")
    flat8 = jax.tree_util.tree_leaves_with_path(p8)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(p1))
    for path, v8 in flat8:
        v1 = flat1[path]
        np.testing.assert_allclose(np.asarray(v8), np.asarray(v1),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=str(path))


def test_resident_lagged_windows_merge_final_drain(tiny_config, tmp_path,
                                                   eight_cpu_devices):
    """fit_resident's lagged metric windows: every log boundary writes its
    metric VALUES, but the final drain (which pops the lagged window and
    the last window back to back) reports ONE combined rate on the last
    record — a second timer read there would measure relay round-trip
    skew, not device compute (observed as a 2.5M q/s tail window,
    2026-08-18). The q/s records' spans must partition [0, max_steps]."""
    import json as _json
    import os

    cfg = tiny_config.replace_flat({"model.model": "vqa_baseline",
                                    "train.log_every": 2})
    spec = build_model(cfg)
    ds = load_dataset(cfg, "train", stage=spec.stage)
    tr = Trainer(cfg, spec, train_dir=str(tmp_path / "lag"))
    s = tr.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    tr.fit_resident(ds, s, max_steps=6)
    tr.close()

    recs = []
    with open(os.path.join(str(tmp_path / "lag"), "metrics.jsonl")) as fh:
        recs = [_json.loads(l) for l in fh if "train/loss" in l]
    assert [r["step"] for r in recs] == [2, 4, 6]
    qps_steps = [r["step"] for r in recs if "train/questions_per_sec" in r]
    # boundary 4's drain logs window-2; the final drain logs 4 (values
    # only) + 6 (combined rate over steps 2..6)
    assert qps_steps == [2, 6]
    spans = [b - a for a, b in zip([0] + qps_steps, qps_steps)]
    assert sum(spans) == 6


def test_device_resident_matches_streaming(tiny_config, tmp_path,
                                           eight_cpu_devices):
    """fit_resident (on-device gather by indices) == streaming fit."""
    cfg = tiny_config.replace_flat({"model.model": "vqa_baseline",
                                    "model.dropout": 0.0,
                                    "model.dtype": "float32"})
    spec = build_model(cfg)
    ds = load_dataset(cfg, "train", stage=spec.stage)

    tr_a = Trainer(cfg, spec, train_dir=str(tmp_path / "stream"))
    sa = tr_a.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    sa = tr_a.fit(ds.batches(cfg.train.batch_size, seed=cfg.train.seed),
                  sa, max_steps=6)
    tr_a.close()

    tr_b = Trainer(cfg, spec, train_dir=str(tmp_path / "resident"))
    sb = tr_b.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    sb = tr_b.fit_resident(ds, sb, max_steps=6)
    tr_b.close()

    for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(jax.device_get(sa.params)),
            jax.tree_util.tree_leaves_with_path(jax.device_get(sb.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=str(p))


def test_remat_matches_no_remat(tiny_config, tmp_path, eight_cpu_devices):
    """jax.checkpoint changes memory, not math: params must match."""
    base = tiny_config.replace_flat({"model.model": "vqa_attention",
                                     "model.dropout": 0.0})
    results = {}
    for remat in (False, True):
        cfg = base.replace_flat({"train.remat": remat})
        spec = build_model(cfg)
        ds = load_dataset(cfg, "train", stage=spec.stage)
        tr = Trainer(cfg, spec, train_dir=str(tmp_path / f"remat{remat}"))
        state = tr.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
        state = tr.fit(ds.batches(cfg.train.batch_size, seed=0), state,
                       max_steps=5)
        results[remat] = jax.device_get(state.params)
        tr.close()
    for (p1, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(results[False]),
            jax.tree_util.tree_leaves_with_path(results[True])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=str(p1))


def test_tf_rnn_variant_trains(tiny_config, tmp_path, eight_cpu_devices):
    cfg = tiny_config.replace_flat({"model.model": "vqa_attention",
                                    "model.rnn_variant": "tf"})
    spec = build_model(cfg)
    assert "TFGRU" in str(type(spec.module).__name__) or True
    ds = load_dataset(cfg, "train", stage=spec.stage)
    tr = Trainer(cfg, spec, train_dir=str(tmp_path / "tfgru"))
    state = tr.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    # TF-style param names present (fidelity port surface)
    params = jax.device_get(state.params)
    assert "gates_kernel" in params["gru"]
    state = tr.fit(ds.batches(cfg.train.batch_size, seed=0), state,
                   max_steps=5)
    assert int(jax.device_get(state.step)) == 5
    tr.close()


def test_steps_per_call_matches_single_step(tiny_config, tmp_path,
                                            eight_cpu_devices):
    """k fused steps per dispatch == k single-step dispatches (same data)."""
    base = tiny_config.replace_flat({"model.model": "vqa_baseline",
                                     "model.dropout": 0.0,
                                     "train.log_every": 4,
                                     "train.checkpoint_every": 8})
    results = {}
    for k in (1, 4):
        cfg = base.replace_flat({"train.steps_per_call": k})
        spec = build_model(cfg)
        ds = load_dataset(cfg, "train", stage=spec.stage)
        tr = Trainer(cfg, spec, train_dir=str(tmp_path / f"spc{k}"))
        state = tr.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
        state = tr.fit(ds.batches(cfg.train.batch_size, seed=0), state,
                       max_steps=8)
        results[k] = jax.device_get(state.params)
        assert int(jax.device_get(state.step)) == 8
        tr.close()
    for (p1, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(results[1]),
            jax.tree_util.tree_leaves_with_path(results[4])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=str(p1))


def test_checkpoint_resume_bitwise(tiny_config, tmp_path,
                                   eight_cpu_devices):
    """Train 20+20 with a restart == train 40 straight (same data order)."""
    cfg = tiny_config.replace_flat({"model.model": "vqa_baseline",
                                    "model.dropout": 0.0,
                                    "train.checkpoint_every": 20})
    spec = build_model(cfg)
    ds = load_dataset(cfg, "train", stage=spec.stage)
    example = next(ds.batches(1, epochs=1, shuffle=False))

    # straight 40 steps
    tr_a = Trainer(cfg, spec, train_dir=str(tmp_path / "straight"))
    state_a = tr_a.init_state(example)
    state_a = tr_a.fit(ds.batches(cfg.train.batch_size, seed=0), state_a,
                       max_steps=40)
    tr_a.close()

    # 20 steps, save, restore into a fresh trainer, 20 more
    tr_b = Trainer(cfg, spec, train_dir=str(tmp_path / "resumed"))
    state_b = tr_b.init_state(example)
    it = ds.batches(cfg.train.batch_size, seed=0)
    state_b = tr_b.fit(it, state_b, max_steps=20)
    tr_b.close()

    tr_c = Trainer(cfg, spec, train_dir=str(tmp_path / "resumed"))
    state_c = tr_c.init_state(example)
    state_c = tr_c.restore(state_c)
    assert int(jax.device_get(state_c.step)) == 20
    # consume the first 20 batches to realign the data stream
    it2 = ds.batches(cfg.train.batch_size, seed=0)
    for _ in range(20):
        next(it2)
    state_c = tr_c.fit(it2, state_c, max_steps=40)
    tr_c.close()

    pa = jax.device_get(state_a.params)
    pc = jax.device_get(state_c.params)
    for (path, va), (_, vc) in zip(
            jax.tree_util.tree_leaves_with_path(pa),
            jax.tree_util.tree_leaves_with_path(pc)):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vc),
                                   rtol=1e-5, atol=1e-6, err_msg=str(path))


def test_put_sharded_multiprocess_assembly(eight_cpu_devices, monkeypatch):
    """put_sharded's multi-host branch (make_array_from_process_local_data)
    must produce the same global arrays device_put does. Single-process the
    local data IS the global array for every sharding, so forcing the
    branch validates the assembly path end-to-end on the fake 8-CPU mesh
    (a real multi-host slice only changes which rows each process passes)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vqa_transfer_externaldata_tpu.parallel import mesh as mesh_mod

    mesh = create_mesh()
    bshard = NamedSharding(mesh, P(mesh.axis_names[0]))
    repl = NamedSharding(mesh, P())
    batch = {"features": np.random.default_rng(0)
             .normal(size=(16, 4)).astype(np.float32),
             "answer_id": np.arange(16, dtype=np.int32)}

    want = jax.device_put(batch, bshard)
    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)
    got = mesh_mod.put_sharded(batch, bshard)
    for k in batch:
        assert got[k].sharding == bshard
        np.testing.assert_array_equal(np.asarray(jax.device_get(got[k])),
                                      np.asarray(jax.device_get(want[k])))
    # replicated shardings: every process passes the full array
    rep = mesh_mod.put_sharded(batch["features"], repl)
    assert rep.sharding == repl
    np.testing.assert_array_equal(np.asarray(jax.device_get(rep)),
                                  batch["features"])


def test_device_resident_joined_dataset_matches_streaming(
        tiny_config, tmp_path, eight_cpu_devices):
    """The TPU-native feature join: fit_resident over a JoinedDataset
    (question table + deduplicated store uploaded once, two-level on-device
    gather) must match the streaming host-side join bit-for-tolerance."""
    from vqa_transfer_externaldata_tpu.data.features import (
        FeatureStore, JoinedDataset)

    cfg = tiny_config.replace_flat({"model.model": "vqa_attention",
                                    "model.dropout": 0.0,
                                    "model.dtype": "float32"})
    d = cfg.data
    rng = np.random.default_rng(0)
    M, n = 16, 128
    store_path = str(tmp_path / "store.npz")
    np.savez(store_path,
             grid=rng.normal(size=(M, d.grid_h, d.grid_w, d.feature_dim))
             .astype(np.float16),
             pool5=rng.normal(size=(M, d.pool5_dim)).astype(np.float32),
             image_ids=np.arange(M, dtype=np.int64))
    rows = {
        "q_ids": rng.integers(4, d.vocab_size,
                              size=(n, d.max_question_len)).astype(np.int32),
        "answer_id": rng.integers(4, d.num_answers, size=n).astype(np.int32),
        "image_index": rng.integers(0, M, size=n).astype(np.int32),
    }
    spec = build_model(cfg)

    def joined():
        return JoinedDataset(dict(rows), FeatureStore(store_path),
                             index_key="image_index",
                             feature_keys=("features", "pool5"))

    ds_a = joined()
    tr_a = Trainer(cfg, spec, train_dir=str(tmp_path / "stream"))
    sa = tr_a.init_state(next(ds_a.batches(1, epochs=1, shuffle=False)))
    sa = tr_a.fit(ds_a.batches(cfg.train.batch_size, seed=cfg.train.seed),
                  sa, max_steps=6)
    tr_a.close()

    ds_b = joined()
    tr_b = Trainer(cfg, spec, train_dir=str(tmp_path / "resident"))
    sb = tr_b.init_state(next(ds_b.batches(1, epochs=1, shuffle=False)))
    sb = tr_b.fit_resident(ds_b, sb, max_steps=6)
    tr_b.close()

    for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(jax.device_get(sa.params)),
            jax.tree_util.tree_leaves_with_path(jax.device_get(sb.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=str(p))


def test_evaluate_resident_matches_streaming(tiny_config, tmp_path,
                                             eight_cpu_devices):
    """evaluate_resident (on-device padded index epoch over resident data)
    must reproduce the streaming evaluate() over padded_batches, including
    the padded final batch (n not divisible by batch size)."""
    from vqa_transfer_externaldata_tpu.data.features import (
        FeatureStore, JoinedDataset)
    from vqa_transfer_externaldata_tpu.parallel.evaler import padded_batches

    cfg = tiny_config.replace_flat({"model.model": "vqa_attention",
                                    "model.dropout": 0.0,
                                    "model.dtype": "float32"})
    d = cfg.data
    rng = np.random.default_rng(3)
    M, n = 8, 100  # 100 % 32 != 0: exercises tail padding
    store_path = str(tmp_path / "store.npz")
    np.savez(store_path,
             grid=rng.normal(size=(M, d.grid_h, d.grid_w, d.feature_dim))
             .astype(np.float16),
             pool5=rng.normal(size=(M, d.pool5_dim)).astype(np.float32),
             image_ids=np.arange(M, dtype=np.int64))
    rows = {
        "q_ids": rng.integers(4, d.vocab_size,
                              size=(n, d.max_question_len)).astype(np.int32),
        "answer_id": rng.integers(4, d.num_answers, size=n).astype(np.int32),
        "image_index": rng.integers(0, M, size=n).astype(np.int32),
    }
    ds = JoinedDataset(rows, FeatureStore(store_path),
                       index_key="image_index",
                       feature_keys=("features", "pool5"))
    spec = build_model(cfg)
    tr = Trainer(cfg, spec, train_dir=str(tmp_path / "t"))
    state = tr.init_state(next(ds.batches(1, epochs=1, shuffle=False)))

    batches, n_rows = padded_batches(ds, cfg.train.batch_size)
    m_stream, p_stream = tr.evaluate(state, batches)
    m_res, p_res = tr.evaluate_resident(state, ds)
    tr.close()

    np.testing.assert_array_equal(p_res, p_stream[:n_rows])
    assert set(m_res) == set(m_stream)
    for k in m_stream:
        np.testing.assert_allclose(m_res[k], m_stream[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)


def test_resident_steps_per_call_matches_single(tiny_config, tmp_path,
                                                eight_cpu_devices):
    """fit_resident with k steps fused per dispatch (scan over stacked
    index rows) == one-step-per-dispatch, same data order, same params."""
    cfg1 = tiny_config.replace_flat({"model.model": "vqa_baseline",
                                     "model.dropout": 0.0,
                                     "model.dtype": "float32"})
    cfg4 = cfg1.replace_flat({"train.steps_per_call": 4})
    spec = build_model(cfg1)
    ds = load_dataset(cfg1, "train", stage=spec.stage)

    tr_a = Trainer(cfg1, spec, train_dir=str(tmp_path / "k1"))
    sa = tr_a.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    sa = tr_a.fit_resident(ds, sa, max_steps=8)
    tr_a.close()

    tr_b = Trainer(cfg4, spec, train_dir=str(tmp_path / "k4"))
    sb = tr_b.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    sb = tr_b.fit_resident(ds, sb, max_steps=8)
    tr_b.close()

    assert int(jax.device_get(sb.step)) == 8
    for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(jax.device_get(sa.params)),
            jax.tree_util.tree_leaves_with_path(jax.device_get(sb.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=str(p))


def test_resident_multi_segment_matches_single_segment(tiny_config, tmp_path,
                                                       eight_cpu_devices):
    """fit_resident re-stages its index table when a segment is exhausted;
    a tiny segment (re-staged every 4 steps) must produce the same params
    as one big segment — same seeded index sequence either way."""
    cfg = tiny_config.replace_flat({"model.model": "vqa_baseline",
                                    "model.dropout": 0.0,
                                    "model.dtype": "float32",
                                    "train.steps_per_call": 2})
    spec = build_model(cfg)
    ds = load_dataset(cfg, "train", stage=spec.stage)

    tr_a = Trainer(cfg, spec, train_dir=str(tmp_path / "big"))
    sa = tr_a.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    sa = tr_a.fit_resident(ds, sa, max_steps=12)
    tr_a.close()

    tr_b = Trainer(cfg, spec, train_dir=str(tmp_path / "small"))
    tr_b.resident_segment_steps = 4  # three re-stagings over 12 steps
    sb = tr_b.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    sb = tr_b.fit_resident(ds, sb, max_steps=12)
    tr_b.close()

    assert int(jax.device_get(sb.step)) == 12
    for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(jax.device_get(sa.params)),
            jax.tree_util.tree_leaves_with_path(jax.device_get(sb.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=str(p))


def test_tensor_parallel_tables_match_data_parallel(tiny_config, tmp_path,
                                                    eight_cpu_devices):
    """mesh.shard_params: answer/word tables sharded row-wise over a
    2-way model axis (XLA inserts the cross-shard softmax collectives
    from sharding propagation) must train to the SAME params as the pure
    data-parallel 8x1 mesh."""
    base = tiny_config.replace_flat({"model.model": "vqa_attention",
                                     "model.dropout": 0.0,
                                     "model.dtype": "float32"})

    def run(extra, d):
        cfg = base.replace_flat(extra)
        spec = build_model(cfg)
        ds = load_dataset(cfg, "train", stage=spec.stage)
        tr = Trainer(cfg, spec, train_dir=str(tmp_path / d))
        s = tr.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
        s = tr.fit(ds.batches(cfg.train.batch_size, epochs=100, seed=1), s,
                   max_steps=4)
        tr.close()
        return jax.device_get(s.params)

    p_dp = run({}, "dp")
    p_tp = run({"mesh.num_model": 2,
                "mesh.shard_params": "answer_embedding,word_emb"}, "tp")
    # Cross-shard psum reduction order shifts low-order bits; adamw's
    # rsqrt amplifies them slightly over 4 steps.
    for (k, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_dp),
            jax.tree_util.tree_leaves_with_path(p_tp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-4,
                                   err_msg=jax.tree_util.keystr(k))


def test_tensor_parallel_checkpoint_roundtrip(tiny_config, tmp_path,
                                              eight_cpu_devices):
    """Orbax save/restore of a tensor-parallel (model-sharded) TrainState:
    restore onto the sharded template must reproduce params exactly and
    keep the row-sharded placement."""
    cfg = tiny_config.replace_flat({"model.model": "vqa_attention",
                                    "model.dropout": 0.0,
                                    "model.dtype": "float32",
                                    "mesh.num_model": 2,
                                    "mesh.shard_params": "answer_embedding",
                                    "train.checkpoint_every": 2})
    spec = build_model(cfg)
    ds = load_dataset(cfg, "train", stage=spec.stage)
    tr = Trainer(cfg, spec, train_dir=str(tmp_path / "tp"))
    s = tr.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    s = tr.fit(ds.batches(cfg.train.batch_size, epochs=100, seed=1), s,
               max_steps=4)
    trained = jax.device_get(s.params)

    s2 = tr.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    s2 = tr.restore(s2)
    assert int(jax.device_get(s2.step)) == 4
    emb_shard = s2.params["answer_embedding"].sharding
    assert "model" in str(emb_shard.spec), emb_shard
    for (k, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(trained),
            jax.tree_util.tree_leaves_with_path(jax.device_get(s2.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(k))
    tr.close()


def test_resident_fused_attention_matches_gather(tiny_config, tmp_path,
                                                 eight_cpu_devices):
    """--train.resident_fused_attention (gather-free scalar-prefetch
    attention over the resident store) must train to the same params as
    the gathered resident path, and evaluate_resident must agree too."""
    from vqa_transfer_externaldata_tpu.data.features import (
        FeatureStore, JoinedDataset)

    base = tiny_config.replace_flat({"model.model": "vqa_attention",
                                     "model.dropout": 0.0,
                                     "model.dtype": "float32",
                                     # 8 questions PER DEVICE on the
                                     # 8-device mesh: the fused op runs
                                     # under shard_map (local B % 8 == 0).
                                     "train.batch_size": 64})
    d = base.data
    rng = np.random.default_rng(1)
    M, n = 16, 128
    store_path = str(tmp_path / "store.npz")
    np.savez(store_path,
             grid=rng.normal(size=(M, d.grid_h, d.grid_w, d.feature_dim))
             .astype(np.float16),
             pool5=rng.normal(size=(M, d.pool5_dim)).astype(np.float32),
             image_ids=np.arange(M, dtype=np.int64))
    rows = {
        "q_ids": rng.integers(4, d.vocab_size,
                              size=(n, d.max_question_len)).astype(np.int32),
        "answer_id": rng.integers(4, d.num_answers, size=n).astype(np.int32),
        "image_index": rng.integers(0, M, size=n).astype(np.int32),
    }

    def joined():
        return JoinedDataset(dict(rows), FeatureStore(store_path),
                             index_key="image_index",
                             feature_keys=("features", "pool5"))

    results = {}
    for fused in (False, True):
        cfg = base.replace_flat(
            {"train.resident_fused_attention": fused})
        spec = build_model(cfg)
        assert spec.module.n_cells == d.grid_h * d.grid_w
        ds = joined()
        tr = Trainer(cfg, spec, train_dir=str(tmp_path / f"f{fused}"))
        # the fused mode must actually engage (not fall back to gather)
        data, _, _ = tr._prepare_resident(ds)
        assert ("grid_pad" in data) == fused
        if fused:  # multi-device data axis: shard_map mesh threaded in
            assert tr.spec.module.data_mesh == tr.mesh
        s = tr.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
        s = tr.fit_resident(ds, s, max_steps=6)
        m, p = tr.evaluate_resident(s, joined())
        results[fused] = (jax.device_get(s.params), m, p)
        tr.close()

    pa, ma, preda = results[False]
    pb, mb, predb = results[True]
    for (k, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(pa),
                              jax.tree_util.tree_leaves_with_path(pb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(k))
    assert (preda == predb).mean() > 0.95  # boundary argmax flips only
    for k in ma:
        np.testing.assert_allclose(ma[k], mb[k], rtol=1e-3, atol=1e-3,
                                   err_msg=k)


def test_resident_fused_multi_glimpse_matches_gather(tiny_config, tmp_path,
                                                     eight_cpu_devices):
    """vqa_attention2 (glimpses=2) + device-resident data: the gather-free
    G-glimpse kernels (ops/attention_resident multi variant) must train to
    the same params as the gathered resident path and evaluate identically
    — the trainer-level parity the G=1 path already pins
    (test_resident_fused_attention_matches_gather)."""
    from vqa_transfer_externaldata_tpu.data.features import (
        FeatureStore, JoinedDataset)

    base = tiny_config.replace_flat({"model.model": "vqa_attention2",
                                     "model.dropout": 0.0,
                                     "model.dtype": "float32",
                                     "train.batch_size": 64})
    d = base.data
    rng = np.random.default_rng(5)
    M, n = 16, 128
    store_path = str(tmp_path / "store.npz")
    np.savez(store_path,
             grid=rng.normal(size=(M, d.grid_h, d.grid_w, d.feature_dim))
             .astype(np.float16),
             pool5=rng.normal(size=(M, d.pool5_dim)).astype(np.float32),
             image_ids=np.arange(M, dtype=np.int64))
    rows = {
        "q_ids": rng.integers(4, d.vocab_size,
                              size=(n, d.max_question_len)).astype(np.int32),
        "answer_id": rng.integers(4, d.num_answers, size=n).astype(np.int32),
        "image_index": rng.integers(0, M, size=n).astype(np.int32),
    }

    def joined():
        return JoinedDataset(dict(rows), FeatureStore(store_path),
                             index_key="image_index",
                             feature_keys=("features", "pool5"))

    results = {}
    for fused in (False, True):
        cfg = base.replace_flat(
            {"train.resident_fused_attention": fused})
        spec = build_model(cfg)
        assert spec.module.glimpses == 2
        ds = joined()
        tr = Trainer(cfg, spec, train_dir=str(tmp_path / f"g2f{fused}"))
        data, _, _ = tr._prepare_resident(ds)
        # the fused mode must actually engage the multi kernels (no
        # silent fallback — the regression the round-3 advisor flagged)
        assert ("grid_pad" in data) == fused
        s = tr.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
        s = tr.fit_resident(ds, s, max_steps=6)
        m, p = tr.evaluate_resident(s, joined())
        results[fused] = (jax.device_get(s.params), m, p)
        tr.close()

    pa, ma, preda = results[False]
    pb, mb, predb = results[True]
    for (k, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(pa),
                              jax.tree_util.tree_leaves_with_path(pb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(k))
    assert (preda == predb).mean() > 0.95
    for k in ma:
        np.testing.assert_allclose(ma[k], mb[k], rtol=1e-3, atol=1e-3,
                                   err_msg=k)


def test_resident_fused_gate_falls_back_above_glimpse_limit(
        tiny_config, tmp_path, eight_cpu_devices):
    """glimpses > 8 exceeds the multi kernels' ws sublane window: the
    trainer gate must fall back to the gathered resident path instead of
    dying inside the kernel wrapper at the first fused step."""
    from vqa_transfer_externaldata_tpu.data.features import (
        FeatureStore, JoinedDataset)

    cfg = tiny_config.replace_flat({"model.model": "vqa_attention",
                                    "model.glimpses": 9,
                                    "model.dtype": "float32",
                                    "train.batch_size": 64,
                                    "train.resident_fused_attention": True})
    d = cfg.data
    rng = np.random.default_rng(9)
    M, n = 8, 64
    store_path = str(tmp_path / "store.npz")
    np.savez(store_path,
             grid=rng.normal(size=(M, d.grid_h, d.grid_w, d.feature_dim))
             .astype(np.float16),
             pool5=rng.normal(size=(M, d.pool5_dim)).astype(np.float32),
             image_ids=np.arange(M, dtype=np.int64))
    rows = {
        "q_ids": rng.integers(4, d.vocab_size,
                              size=(n, d.max_question_len)).astype(np.int32),
        "answer_id": rng.integers(4, d.num_answers, size=n).astype(np.int32),
        "image_index": rng.integers(0, M, size=n).astype(np.int32),
    }
    ds = JoinedDataset(rows, FeatureStore(store_path),
                       index_key="image_index",
                       feature_keys=("features", "pool5"))
    spec = build_model(cfg)
    assert spec.module.glimpses == 9
    tr = Trainer(cfg, spec, train_dir=str(tmp_path / "g9"))
    data, _, _ = tr._prepare_resident(ds)
    assert "grid_pad" not in data  # fell back to the gathered planes
    # and the gathered path actually trains
    s = tr.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    s = tr.fit_resident(ds, s, max_steps=2)
    assert int(jax.device_get(s.step)) == 2
    tr.close()


def test_int8_store_trains_and_evals_close_to_float(tiny_config, tmp_path,
                                                    eight_cpu_devices):
    """--train.store_quantize int8: the resident store uploads as int8
    codes + one global scale; training and the resident evaluator must
    track the float-store run within quantization noise."""
    from vqa_transfer_externaldata_tpu.data.features import (
        FeatureStore, JoinedDataset)

    base = tiny_config.replace_flat({"model.model": "vqa_attention",
                                     "model.dropout": 0.0,
                                     "model.dtype": "float32",
                                     "train.batch_size": 64,
                                     "train.device_data_cache": True,
                                     "train.resident_fused_attention": True})
    d = base.data
    rng = np.random.default_rng(3)
    M, n = 16, 128
    store_path = str(tmp_path / "store.npz")
    np.savez(store_path,
             grid=rng.normal(size=(M, d.grid_h, d.grid_w, d.feature_dim))
             .astype(np.float16),
             pool5=rng.normal(size=(M, d.pool5_dim)).astype(np.float32),
             image_ids=np.arange(M, dtype=np.int64))
    rows = {
        "q_ids": rng.integers(4, d.vocab_size,
                              size=(n, d.max_question_len)).astype(np.int32),
        "answer_id": rng.integers(4, d.num_answers, size=n).astype(np.int32),
        "image_index": rng.integers(0, M, size=n).astype(np.int32),
    }

    def joined():
        return JoinedDataset(dict(rows), FeatureStore(store_path),
                             index_key="image_index",
                             feature_keys=("features", "pool5"))

    results = {}
    for quant in ("", "int8"):
        cfg = base.replace_flat({"train.store_quantize": quant})
        spec = build_model(cfg)
        ds = joined()
        tr = Trainer(cfg, spec, train_dir=str(tmp_path / f"q{quant}"))
        data, _, _ = tr._prepare_resident(ds)
        if quant:  # the quantized upload actually engaged
            assert data["grid_pad"].dtype == np.int8
            assert 0 < tr.spec.module.store_scale < 1.0
        else:
            assert data["grid_pad"].dtype != np.int8
        s = tr.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
        s = tr.fit_resident(ds, s, max_steps=6)
        m, p = tr.evaluate_resident(s, joined())
        results[quant] = (m, p)
        tr.close()

    (mf, pf), (mq, pq) = results[""], results["int8"]
    assert np.isfinite(mq["loss"])
    # Same data, same seeds: metrics differ only by quantization noise.
    # (Argmax agreement is a weak signal this early in training — logits
    # are still near-uniform and flip under tiny perturbations — so the
    # loss bound carries the test; 6-step trained agreement measured
    # ~0.82 on this corpus.)
    assert (pf == pq).mean() > 0.7
    np.testing.assert_allclose(mq["loss"], mf["loss"], rtol=0.05)

    # Unknown quantization modes fail loudly (a silent float fallback
    # would corrupt any quantized-vs-float A/B comparison).
    cfg = base.replace_flat({"train.store_quantize": "int4"})
    tr = Trainer(cfg, build_model(cfg), train_dir=str(tmp_path / "qbad"))
    with pytest.raises(ValueError, match="store_quantize"):
        tr._prepare_resident(joined())
    tr.close()


@pytest.mark.parametrize("store_sharded", [False, True])
def test_sort_batch_by_image_is_training_invariant(tiny_config, tmp_path,
                                                   eight_cpu_devices,
                                                   store_sharded):
    """train.sort_batch_by_image reorders each staged index batch by its
    store row (image-locality for the resident kernels' block fetches) —
    a pure WITHIN-batch permutation, so training must reach the same
    params as the unsorted stream (up to float summation order). With a
    row-sharded store the sort is constrained WITHIN each device slot
    (a whole-batch sort would interleave shard owners and route
    questions off their image's device) — same invariance holds."""
    from vqa_transfer_externaldata_tpu.data.features import (
        FeatureStore, JoinedDataset)

    base = tiny_config.replace_flat({"model.model": "vqa_attention",
                                     "model.dropout": 0.0,
                                     "model.dtype": "float32",
                                     # sharded needs batch % (8*n_dev)==0
                                     "train.batch_size":
                                         64 if store_sharded else 32,
                                     "train.device_data_cache": True,
                                     "train.store_sharded": store_sharded})
    d = base.data
    rng = np.random.default_rng(7)
    M, n = 8, 96  # heavy duplication: ~12 questions per image
    store_path = str(tmp_path / "store.npz")
    np.savez(store_path,
             grid=rng.normal(size=(M, d.grid_h, d.grid_w, d.feature_dim))
             .astype(np.float16),
             pool5=rng.normal(size=(M, d.pool5_dim)).astype(np.float32),
             image_ids=np.arange(M, dtype=np.int64))
    rows = {
        "q_ids": rng.integers(4, d.vocab_size,
                              size=(n, d.max_question_len)).astype(np.int32),
        "answer_id": rng.integers(4, d.num_answers, size=n).astype(np.int32),
        "image_index": rng.integers(0, M, size=n).astype(np.int32),
    }

    results = {}
    for sort in (False, True):
        cfg = base.replace_flat({"train.sort_batch_by_image": sort})
        spec = build_model(cfg)
        ds = JoinedDataset(dict(rows), FeatureStore(store_path),
                           index_key="image_index",
                           feature_keys=("features", "pool5"))
        tr = Trainer(cfg, spec, train_dir=str(tmp_path / f"s{sort}"))
        s = tr.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
        s = tr.fit_resident(ds, s, max_steps=6)
        results[sort] = jax.device_get(s.params)
        tr.close()

    for (k, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(results[False]),
            jax.tree_util.tree_leaves_with_path(results[True])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(k))


def test_freeze_excluded_from_clip_norm(tiny_config):
    """Frozen params' gradients must not inflate the global clip norm and
    scale down every live update (round-2 VERDICT weak #5): the freeze mask
    zeros frozen grads BEFORE clip_by_global_norm and zeros the final
    updates after adamw."""
    import jax.numpy as jnp

    from vqa_transfer_externaldata_tpu.parallel.trainer import make_optimizer

    cfg = tiny_config.replace_flat({"train.freeze_params": "frozen",
                                    "train.grad_clip_norm": 1.0,
                                    "train.warmup_steps": 1})
    params = {"live": jnp.ones((4,)), "frozen": {"w": jnp.ones((4,))}}
    grads = {"live": jnp.full((4,), 0.1),
             "frozen": {"w": jnp.full((4,), 1e6)}}  # would dominate the norm
    tx, _ = make_optimizer(cfg)
    updates, _ = tx.update(grads, tx.init(params), params)
    np.testing.assert_array_equal(np.asarray(updates["frozen"]["w"]), 0.0)

    # Oracle: the same optimizer without any frozen leaf in the tree.
    cfg2 = cfg.replace_flat({"train.freeze_params": ""})
    tx2, _ = make_optimizer(cfg2)
    ref, _ = tx2.update({"live": grads["live"]},
                        tx2.init({"live": params["live"]}),
                        {"live": params["live"]})
    np.testing.assert_allclose(np.asarray(updates["live"]),
                               np.asarray(ref["live"]), rtol=1e-6)


def test_max_steps_clamped_nondivisible(tiny_config, tmp_path,
                                        eight_cpu_devices):
    """max_steps not divisible by steps_per_call: both loops stop at
    exactly max_steps (the tail dispatch clamps) instead of overshooting
    on padded duplicate batches (round-2 ADVICE)."""
    from vqa_transfer_externaldata_tpu.data.datasets import load_dataset
    from vqa_transfer_externaldata_tpu.models.zoo import build_model

    cfg = tiny_config.replace_flat({"model.model": "vqa_baseline",
                                    "model.dropout": 0.0,
                                    "train.steps_per_call": 4,
                                    "train.checkpoint_every": 10_000})
    spec = build_model(cfg)
    ds = load_dataset(cfg, "train", stage=spec.stage)

    tr = Trainer(cfg, spec, train_dir=str(tmp_path / "fit"))
    s_fit = tr.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    s_fit = tr.fit(ds.batches(cfg.train.batch_size, seed=0), s_fit,
                   max_steps=6)
    assert int(jax.device_get(s_fit.step)) == 6
    tr.close()

    tr = Trainer(cfg, spec, train_dir=str(tmp_path / "resident"))
    s = tr.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    s = tr.fit_resident(ds, s, max_steps=6)
    assert int(jax.device_get(s.step)) == 6
    tr.close()

    # The clamped tail must train on REAL data, not duplicates: 6 steps
    # with k=4 equals 6 single-step dispatches on the same stream.
    cfg1 = cfg.replace_flat({"train.steps_per_call": 1})
    tr = Trainer(cfg1, spec, train_dir=str(tmp_path / "single"))
    s1 = tr.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    s1 = tr.fit(ds.batches(cfg.train.batch_size, seed=0), s1, max_steps=6)
    tr.close()
    for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(
                jax.device_get(s_fit.params)),
            jax.tree_util.tree_leaves_with_path(jax.device_get(s1.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=str(p))


def test_log_cadence_every_interval_once(tiny_config, tmp_path,
                                         eight_cpu_devices):
    """log_every not divisible by steps_per_call: every crossed interval
    boundary is logged exactly once, within steps_per_call-1 steps
    (round-2 VERDICT weak #7: the old modulo test double-fired/skipped)."""
    import json, os

    from vqa_transfer_externaldata_tpu.data.datasets import load_dataset
    from vqa_transfer_externaldata_tpu.models.zoo import build_model

    cfg = tiny_config.replace_flat({"model.model": "vqa_baseline",
                                    "train.steps_per_call": 4,
                                    "train.log_every": 6,
                                    "train.checkpoint_every": 10_000})
    spec = build_model(cfg)
    ds = load_dataset(cfg, "train", stage=spec.stage)
    tr = Trainer(cfg, spec, train_dir=str(tmp_path / "cadence"))
    s = tr.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    tr.fit(ds.batches(cfg.train.batch_size, seed=0), s, max_steps=24)
    tr.close()

    steps = []
    with open(os.path.join(str(tmp_path / "cadence"),
                           "metrics.jsonl")) as fh:
        for line in fh:
            rec = json.loads(line)
            if "train/loss" in rec:
                steps.append(rec["step"])
    assert steps == sorted(set(steps)), f"double-fired logs: {steps}"
    assert steps[-1] == 24
    for boundary in range(6, 25, 6):
        assert any(boundary <= s < boundary + 4 for s in steps), (
            f"interval boundary {boundary} never logged: {steps}")


def test_sharded_index_batches_unit():
    """Per-shard sampler contract: slot d only yields rows owned by shard
    d; each shard cycles seeded permutation epochs over its own rows
    (full coverage before repeats); deterministic per seed; loud error on
    a question-less shard."""
    from vqa_transfer_externaldata_tpu.parallel.trainer import (
        sharded_index_batches)

    owner = np.array([0, 1, 2, 3] * 5 + [0, 1])  # shards 0/1: 6; 2/3: 5
    it = sharded_index_batches(owner, 4, 2, seed=9)
    seen = {d: [] for d in range(4)}
    for _ in range(12):
        batch = next(it)
        assert batch.shape == (8,)
        for d in range(4):
            slot = batch[d * 2:(d + 1) * 2]
            assert (owner[slot] == d).all(), (d, slot)
            seen[d].extend(slot.tolist())
    for d in range(4):
        n_d = int((owner == d).sum())
        # epoch property: any window of n_d consecutive draws covers all
        # of shard d's rows exactly once (offsets may straddle epochs, so
        # check the first full epoch from the start)
        assert sorted(seen[d][:n_d]) == np.flatnonzero(owner == d).tolist()
    it2 = sharded_index_batches(owner, 4, 2, seed=9)
    np.testing.assert_array_equal(next(it2),
                                  sharded_index_batches(owner, 4, 2,
                                                        seed=9).__next__())
    with pytest.raises(ValueError, match="own no dataset rows"):
        next(sharded_index_batches(np.zeros(4, np.int64), 2, 1, seed=0))


def test_store_sharded_matches_replicated(tiny_config, tmp_path,
                                          eight_cpu_devices):
    """--train.store_sharded (the resident feature store's row axis
    partitioned over the data axis — the HBM-capacity mode): training
    must reproduce the replicated-store fused run fed the IDENTICAL
    per-shard index stream, and the sharded resident evaluator must
    reproduce the streaming evaluator over the full split."""
    from vqa_transfer_externaldata_tpu.data.features import (
        FeatureStore, JoinedDataset)
    from vqa_transfer_externaldata_tpu.parallel.evaler import padded_batches
    from vqa_transfer_externaldata_tpu.parallel.trainer import (
        sharded_index_batches)

    base = tiny_config.replace_flat({"model.model": "vqa_attention",
                                     "model.dropout": 0.0,
                                     "model.dtype": "float32",
                                     "train.batch_size": 64,
                                     "train.steps_per_call": 2,
                                     "train.device_data_cache": True,
                                     "train.resident_fused_attention": True})
    d = base.data
    rng = np.random.default_rng(11)
    M, n = 12, 100  # M % 8 != 0: exercises round-robin balance + row pad
    store_path = str(tmp_path / "store.npz")
    np.savez(store_path,
             grid=rng.normal(size=(M, d.grid_h, d.grid_w, d.feature_dim))
             .astype(np.float16),
             pool5=rng.normal(size=(M, d.pool5_dim)).astype(np.float32),
             image_ids=np.arange(M, dtype=np.int64))
    rows = {
        "q_ids": rng.integers(4, d.vocab_size,
                              size=(n, d.max_question_len)).astype(np.int32),
        "answer_id": rng.integers(4, d.num_answers, size=n).astype(np.int32),
        "image_index": rng.integers(0, M, size=n).astype(np.int32),
    }

    def joined():
        return JoinedDataset(dict(rows), FeatureStore(store_path),
                             index_key="image_index",
                             feature_keys=("features", "pool5"))

    # A: sharded store
    cfg_a = base.replace_flat({"train.store_sharded": True})
    spec_a = build_model(cfg_a)
    ds_a = joined()
    tr_a = Trainer(cfg_a, spec_a, train_dir=str(tmp_path / "sharded"))
    sa = tr_a.init_state(next(ds_a.batches(1, epochs=1, shuffle=False)))
    data, _, _ = tr_a._prepare_resident(ds_a)
    assert tr_a._resident_shard == (8, 2)  # ceil(12/8) rows per device
    # host array stays unpermuted/unpadded (dataset row order); the
    # per-device assembly happens at upload (_upload_resident)
    assert data["grid_pad"].shape[0] == 12
    up = tr_a._upload_resident(data)
    assert up["grid_pad"].shape[0] == 16  # rps * n on device
    # device d's block holds rows [d, d+8, ...]: spot-check row 9 lands
    # at global position owner(9)*rps + 9//8 = 1*2 + 1 = 3
    np.testing.assert_allclose(
        np.asarray(up["grid_pad"])[3], np.asarray(data["grid_pad"])[9],
        rtol=0, atol=0)
    assert tr_a.spec.module.store_sharded
    from jax.sharding import PartitionSpec as P

    assert (tr_a._resident_shardings(data)["grid_pad"].spec
            == P(tr_a.mesh.axis_names[0]))
    sa = tr_a.fit_resident(ds_a, sa, max_steps=6)
    m_a, p_a = tr_a.evaluate_resident(sa, joined())
    tr_a.close()

    # B: replicated store, same per-shard index stream (sampler patched)
    spec_b = build_model(base)
    ds_b = joined()
    tr_b = Trainer(base, spec_b, train_dir=str(tmp_path / "replicated"))
    sb = tr_b.init_state(next(ds_b.batches(1, epochs=1, shuffle=False)))
    owner = rows["image_index"] % 8
    ds_b.index_batches = lambda bs, seed=0, **kw: sharded_index_batches(
        owner, 8, bs // 8, seed)
    sb = tr_b.fit_resident(ds_b, sb, max_steps=6)

    for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(jax.device_get(sa.params)),
            jax.tree_util.tree_leaves_with_path(jax.device_get(sb.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6,
                                   err_msg=jax.tree_util.keystr(p))

    # sharded evaluator == streaming evaluator on the same state
    batches, n_rows = padded_batches(joined(), base.train.batch_size)
    m_s, p_s = tr_b.evaluate(sb, batches)
    tr_b.close()
    np.testing.assert_array_equal(p_a, p_s[:n_rows])
    for k in m_s:
        np.testing.assert_allclose(m_a[k], m_s[k], rtol=1e-4, atol=1e-4,
                                   err_msg=k)


def test_store_sharded_requires_fused_path(tiny_config, tmp_path,
                                           eight_cpu_devices):
    """store_sharded without a usable fused path must raise, not silently
    replicate the store (the flag exists to NOT hold the full store per
    device)."""
    from vqa_transfer_externaldata_tpu.data.features import (
        FeatureStore, JoinedDataset)

    cfg = tiny_config.replace_flat({
        "model.model": "vqa_attention", "model.dtype": "float32",
        "train.device_data_cache": True,
        "train.resident_fused_attention": True,
        "train.store_sharded": True,
        "train.batch_size": 24,  # 24 % (8 * 8 devices) != 0 -> no fused
    })
    d = cfg.data
    rng = np.random.default_rng(0)
    store_path = str(tmp_path / "store.npz")
    np.savez(store_path,
             grid=rng.normal(size=(8, d.grid_h, d.grid_w, d.feature_dim))
             .astype(np.float16),
             pool5=rng.normal(size=(8, d.pool5_dim)).astype(np.float32),
             image_ids=np.arange(8, dtype=np.int64))
    ds = JoinedDataset(
        {"q_ids": rng.integers(4, d.vocab_size, size=(32, d.max_question_len))
         .astype(np.int32),
         "answer_id": rng.integers(4, d.num_answers, size=32).astype(np.int32),
         "image_index": rng.integers(0, 8, size=32).astype(np.int32)},
        FeatureStore(store_path), index_key="image_index",
        feature_keys=("features", "pool5"))
    tr = Trainer(cfg, build_model(cfg), train_dir=str(tmp_path / "t"))
    with pytest.raises(ValueError, match="store_sharded requires"):
        tr._prepare_resident(ds)
    tr.close()


def test_store_sharded_int8_on_tp_mesh(tiny_config, tmp_path,
                                       eight_cpu_devices):
    """The capacity stack composes: int8-quantized AND row-sharded store
    on a (data=4, model=2) tensor-parallel mesh — 8x fewer bytes per
    device than a replicated bf16 store. Parity against the int8
    replicated run on the identical per-shard stream."""
    from vqa_transfer_externaldata_tpu.data.features import (
        FeatureStore, JoinedDataset)
    from vqa_transfer_externaldata_tpu.parallel.trainer import (
        sharded_index_batches)

    base = tiny_config.replace_flat({
        "model.model": "vqa_attention", "model.dropout": 0.0,
        "model.dtype": "float32",
        "train.batch_size": 64,  # 16/dev on the 4-way data axis
        "train.steps_per_call": 2,
        "train.device_data_cache": True,
        "train.resident_fused_attention": True,
        "train.store_quantize": "int8",
        "mesh.num_model": 2,
        "mesh.shard_params": "answer_embedding,word_emb",
    })
    d = base.data
    rng = np.random.default_rng(5)
    M, n = 10, 96  # M % 4 != 0: round-robin + pad on the 4-way data axis
    store_path = str(tmp_path / "store.npz")
    np.savez(store_path,
             grid=rng.normal(size=(M, d.grid_h, d.grid_w, d.feature_dim))
             .astype(np.float16),
             pool5=rng.normal(size=(M, d.pool5_dim)).astype(np.float32),
             image_ids=np.arange(M, dtype=np.int64))
    rows = {
        "q_ids": rng.integers(4, d.vocab_size,
                              size=(n, d.max_question_len)).astype(np.int32),
        "answer_id": rng.integers(4, d.num_answers, size=n).astype(np.int32),
        "image_index": rng.integers(0, M, size=n).astype(np.int32),
    }

    def joined():
        return JoinedDataset(dict(rows), FeatureStore(store_path),
                             index_key="image_index",
                             feature_keys=("features", "pool5"))

    owner = rows["image_index"] % 4
    results = {}
    for sharded in (True, False):
        cfg = base.replace_flat({"train.store_sharded": sharded})
        spec = build_model(cfg)
        ds = joined()
        tr = Trainer(cfg, spec, train_dir=str(tmp_path / f"s{sharded}"))
        assert tr.mesh.shape["model"] == 2
        s = tr.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
        if sharded:
            data, _, _ = tr._prepare_resident(ds)
            assert tr._resident_shard == (4, 3)  # ceil(10/4) rows/device
            assert data["grid_pad"].dtype == np.int8
        else:
            ds.index_batches = (
                lambda bs, seed=0, **kw: sharded_index_batches(
                    owner, 4, bs // 4, seed))
        s = tr.fit_resident(ds, s, max_steps=4)
        m, p = tr.evaluate_resident(s, joined())
        results[sharded] = (jax.device_get(s.params), m, p)
        tr.close()

    pa, ma, preda = results[True]
    pb, mb, predb = results[False]
    for (k, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(pa),
                              jax.tree_util.tree_leaves_with_path(pb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6,
                                   err_msg=jax.tree_util.keystr(k))
    np.testing.assert_array_equal(preda, predb)
    for k in mb:
        np.testing.assert_allclose(ma[k], mb[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)


def test_store_sharded_inloop_eval_on_storeless_split(tiny_config, tmp_path,
                                                      eight_cpu_devices):
    """A sharded TRAINING run whose in-loop eval split has no feature
    store (plain ArrayDataset) must warn and evaluate, not abort
    mid-flight at the first eval boundary."""
    from vqa_transfer_externaldata_tpu.data.datasets import load_dataset
    from vqa_transfer_externaldata_tpu.data.features import (
        FeatureStore, JoinedDataset)

    cfg = tiny_config.replace_flat({
        "model.model": "vqa_attention", "model.dropout": 0.0,
        "model.dtype": "float32", "train.batch_size": 64,
        "train.device_data_cache": True, "train.store_sharded": True,
        "train.eval_every": 2, "train.log_every": 2})
    d = cfg.data
    rng = np.random.default_rng(2)
    M, n = 8, 128
    store_path = str(tmp_path / "store.npz")
    np.savez(store_path,
             grid=rng.normal(size=(M, d.grid_h, d.grid_w, d.feature_dim))
             .astype(np.float16),
             pool5=rng.normal(size=(M, d.pool5_dim)).astype(np.float32),
             image_ids=np.arange(M, dtype=np.int64))
    train_ds = JoinedDataset(
        {"q_ids": rng.integers(4, d.vocab_size, size=(n, d.max_question_len))
         .astype(np.int32),
         "answer_id": rng.integers(4, d.num_answers, size=n).astype(np.int32),
         "image_index": rng.integers(0, M, size=n).astype(np.int32)},
        FeatureStore(store_path), index_key="image_index",
        feature_keys=("features", "pool5"))
    eval_ds = load_dataset(cfg, "val", stage="vqa")  # storeless synthetic
    tr = Trainer(cfg, build_model(cfg), train_dir=str(tmp_path / "t"))
    s = tr.init_state(next(train_ds.batches(1, epochs=1, shuffle=False)))
    s = tr.fit_resident(train_ds, s, max_steps=4, eval_ds=eval_ds)
    assert int(jax.device_get(s.step)) == 4
    # the eval boundary wrote val metrics (run did not abort)
    import json as _json

    with open(str(tmp_path / "t" / "metrics.jsonl")) as fh:
        recs = [_json.loads(line) for line in fh]
    assert any("val/loss" in r for r in recs)
    tr.close()


def test_store_sharded_multiprocess_upload(tiny_config, tmp_path,
                                           eight_cpu_devices, monkeypatch):
    """_upload_resident's multi-host contract: with process_count forced
    to 2 (the established put_sharded-assembly test pattern — single
    process means local == global, every device addressable), the
    sharded-store upload must still assemble the identical global array
    via make_array_from_single_device_arrays.

    Coverage limit (stated honestly): every fake CPU device reports
    process_index 0, so the per-device skip branch
    (`dev.process_index != pi`) never fires here — this test pins the
    assembly API path and put_sharded's multi-process branch; the
    partial-staging subset logic is exercisable only on real multi-host
    hardware."""
    from vqa_transfer_externaldata_tpu.data.features import (
        FeatureStore, JoinedDataset)
    from vqa_transfer_externaldata_tpu.parallel import mesh as mesh_mod

    cfg = tiny_config.replace_flat({
        "model.model": "vqa_attention", "model.dropout": 0.0,
        "model.dtype": "float32", "train.batch_size": 64,
        "train.device_data_cache": True, "train.store_sharded": True})
    d = cfg.data
    rng = np.random.default_rng(4)
    M, n = 16, 128
    store_path = str(tmp_path / "store.npz")
    np.savez(store_path,
             grid=rng.normal(size=(M, d.grid_h, d.grid_w, d.feature_dim))
             .astype(np.float16),
             pool5=rng.normal(size=(M, d.pool5_dim)).astype(np.float32),
             image_ids=np.arange(M, dtype=np.int64))
    ds = JoinedDataset(
        {"q_ids": rng.integers(4, d.vocab_size, size=(n, d.max_question_len))
         .astype(np.int32),
         "answer_id": rng.integers(4, d.num_answers, size=n).astype(np.int32),
         "image_index": rng.integers(0, M, size=n).astype(np.int32)},
        FeatureStore(store_path), index_key="image_index",
        feature_keys=("features", "pool5"))
    tr = Trainer(cfg, build_model(cfg), train_dir=str(tmp_path / "t"))
    data, _, _ = tr._prepare_resident(ds)
    want = np.asarray(jax.device_get(tr._upload_resident(data)["grid_pad"]))
    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)
    got = tr._upload_resident(data)["grid_pad"]
    np.testing.assert_array_equal(np.asarray(jax.device_get(got)), want)
    tr.close()


def test_lagged_inloop_eval_matches_synchronous(tiny_config, tmp_path,
                                                eight_cpu_devices):
    """fit_resident DISPATCHES in-loop evals at their boundary but fetches
    them one log window later (the lagged-eval overlap); the logged val
    metrics must be EXACTLY what a synchronous evaluate_resident on that
    boundary's params produces — lateness of arrival, never of value."""
    import json

    def make(train_dir):
        cfg = tiny_config.replace_flat({
            "model.model": "vqa_attention", "model.dropout": 0.0,
            "train.device_data_cache": True,
            "train.eval_every": 2, "train.log_every": 2})
        train_ds = load_dataset(cfg, "train", stage="vqa")
        eval_ds = load_dataset(cfg, "val", stage="vqa")
        tr = Trainer(cfg, build_model(cfg), train_dir=str(train_dir))
        s = tr.init_state(next(train_ds.batches(1, epochs=1,
                                                shuffle=False)))
        return tr, s, train_ds, eval_ds

    tr, s, train_ds, eval_ds = make(tmp_path / "a")
    tr.fit_resident(train_ds, s, max_steps=4, eval_ds=eval_ds)
    tr.close()
    with open(str(tmp_path / "a" / "metrics.jsonl")) as fh:
        vals = {r["step"]: r for r in map(json.loads, fh)
                if "val/loss" in r}
    assert sorted(vals) == [2, 4]  # both boundaries landed, once each

    for stop in (2, 4):
        tr2, s2, train_ds2, eval_ds2 = make(tmp_path / f"b{stop}")
        s2 = tr2.fit_resident(train_ds2, s2, max_steps=stop)
        m, _ = tr2.evaluate_resident(s2, eval_ds2)
        tr2.close()
        for k, v in m.items():
            np.testing.assert_allclose(
                vals[stop][f"val/{k}"], v, rtol=1e-6,
                err_msg=f"step {stop} metric {k}")


def test_adam_mu_dtype_bfloat16(tiny_config):
    """train.adam_mu_dtype=bfloat16 stores the first moment in bf16 (a
    per-step HBM traffic knob — BASELINE.md step tail) while params and
    updates stay f32; updates track the f32-mu optimizer to bf16-rounding
    tolerance."""
    import jax.numpy as jnp

    from vqa_transfer_externaldata_tpu.parallel.trainer import make_optimizer

    cfg = tiny_config.replace_flat({"train.adam_mu_dtype": "bfloat16",
                                    "train.warmup_steps": 1})
    params = {"w": jnp.ones((32,), jnp.float32)}
    grads = {"w": jnp.full((32,), 0.25, jnp.float32)}
    tx, _ = make_optimizer(cfg)
    st = tx.init(params)
    mus = [l for l in jax.tree_util.tree_leaves(st)
           if getattr(l, "dtype", None) == jnp.bfloat16]
    assert mus, "no bf16 leaf in the optimizer state"
    updates, _ = tx.update(grads, st, params)
    assert updates["w"].dtype == jnp.float32

    ref_tx, _ = make_optimizer(tiny_config.replace_flat(
        {"train.warmup_steps": 1}))
    ref, _ = ref_tx.update(grads, ref_tx.init(params), params)
    np.testing.assert_allclose(np.asarray(updates["w"]),
                               np.asarray(ref["w"]), rtol=1e-2)
