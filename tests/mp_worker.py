"""One process of an N-process ``jax.distributed`` CPU run, spawned by
tests/test_multiprocess.py.

Drives the REAL multi-host code paths — no monkeypatched
``jax.process_count``: the per-process index-segment slice
(parallel/trainer.fit_resident ``seg[:, pi*local:(pi+1)*local]``), the
per-process sharded-store block upload
(``make_array_from_single_device_arrays`` in ``_upload_resident``), the
``put_sharded`` multi-process assembly, and the resident evaluator's
``process_allgather`` fetch.

Usage: python mp_worker.py <pid> <nproc> <port> <run_dir> <out_npz>
Process 0 writes preds + metrics + the final param tree to ``out_npz``.
"""

import json
import os
import sys


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, run_dir, out_npz = sys.argv[3], sys.argv[4], sys.argv[5]
    # 4 local fake devices per process (8 global at nproc=2); must be set
    # before jax initializes its backends.
    assert "xla_force_host_platform_device_count" in \
        os.environ.get("XLA_FLAGS", ""), "parent must set XLA_FLAGS"
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc, process_id=pid)
    import numpy as np

    from vqa_transfer_externaldata_tpu.config import Config
    from vqa_transfer_externaldata_tpu.data.datasets import (
        synthetic_vqa_joined)
    from vqa_transfer_externaldata_tpu.models.zoo import build_model
    from vqa_transfer_externaldata_tpu.parallel.trainer import Trainer

    cfg = Config().replace_flat({
        "data.synthetic": True,
        "data.vocab_size": 128, "data.num_answers": 32,
        "data.grid_h": 4, "data.grid_w": 4, "data.feature_dim": 32,
        "data.pool5_dim": 32, "data.max_question_len": 8,
        "model.model": "vqa_attention", "model.dropout": 0.0,
        "model.dtype": "float32", "model.word_dim": 16,
        "model.rnn_dim": 16, "model.fusion_dim": 32,
        "model.att_hidden": 16, "model.answer_dim": 16,
        # 8 questions per device on the 8-device global mesh (the fused
        # resident op's per-shard window).
        "train.batch_size": 64, "train.max_steps": 6,
        "train.steps_per_call": 2, "train.log_every": 2,
        "train.checkpoint_every": 10**9, "train.eval_every": 10**9,
        "train.warmup_steps": 1, "train.learning_rate": 3e-3,
        "train.device_data_cache": True,
        "train.resident_fused_attention": True,
        # Row-sharded store: the HBM-capacity mode whose upload assembly
        # is the multi-process path under test.
        "train.store_sharded": True,
    })
    # n_questions < 256 keeps dataset generation cache-free (two processes
    # racing os.replace on the same cache dir); identical from the seed.
    make_ds = lambda: synthetic_vqa_joined(cfg, n_questions=192,
                                           n_images=16, seed=0)
    ds = make_ds()
    spec = build_model(cfg)
    tr = Trainer(cfg, spec, train_dir=run_dir)
    assert tr.mesh.devices.size == 8, tr.mesh
    state = tr.init_state(next(ds.batches(1, epochs=1, shuffle=False)))
    state = tr.fit_resident(ds, state, max_steps=cfg.train.max_steps)
    metrics, preds = tr.evaluate_resident(state, make_ds())
    params = jax.device_get(state.params)
    tr.close()
    if jax.process_index() == 0:
        flat = {"/".join(str(getattr(k, "key", k)) for k in path):
                np.asarray(v)
                for path, v in
                jax.tree_util.tree_flatten_with_path(params)[0]}
        np.savez(out_npz, preds=np.asarray(preds),
                 metrics=json.dumps(metrics), **flat)
    print(f"mp_worker p{pid}/{nproc}: done", flush=True)


if __name__ == "__main__":
    main()
