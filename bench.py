"""Benchmark: flagship VQA-attention training throughput on real hardware.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

North-star metric (BASELINE.json): VQA v2 questions/sec/chip at global batch
256. The reference never published throughput (BASELINE.md), so
``vs_baseline`` is measured against this project's own recorded round-1
number (kept in BASELINE.md) — >1.0 means faster than round 1.
"""

from __future__ import annotations

import json
import os
import time

# Persistent compilation cache: repeated bench runs skip the (remote,
# occasionally flaky) TPU compile service entirely.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import jax
import numpy as np

# Round-1 recorded value on 1x TPU v5e (questions/sec/chip, batch 256),
# measured 2026-08-16 with the fused Pallas attention path (see BASELINE.md).
ROUND1_BASELINE = 28466.0


def main() -> None:
    from vqa_transfer_externaldata_tpu.config import Config
    from vqa_transfer_externaldata_tpu.data.datasets import synthetic_vqa
    from vqa_transfer_externaldata_tpu.models.zoo import build_model
    from vqa_transfer_externaldata_tpu.parallel.mesh import create_mesh
    from vqa_transfer_externaldata_tpu.parallel.trainer import (
        TrainState, make_optimizer)
    import jax.numpy as jnp
    import optax

    batch_size = 256
    cfg = Config().replace_flat({
        "data.synthetic": True, "data.synthetic_size": batch_size,
        "train.batch_size": batch_size,
    })
    on_tpu = jax.default_backend() != "cpu"
    if not on_tpu:  # CPU smoke: shrink so the bench still runs anywhere
        batch_size = 32
        cfg = cfg.replace_flat({
            "data.synthetic_size": batch_size,
            "data.vocab_size": 256, "data.num_answers": 64,
            "data.feature_dim": 256, "data.pool5_dim": 256,
            "model.rnn_dim": 64, "model.fusion_dim": 128,
            "model.att_hidden": 64, "model.dtype": "float32",
            "train.batch_size": batch_size,
        })

    spec = build_model(cfg)
    ds = synthetic_vqa(cfg, size=batch_size, seed=0)
    import jax.numpy as _jnp

    # Features ship at half width, matching the production pipeline (the
    # extractor stores f16 grids, consumed as bf16 — data/features.py).
    feat_dtype = _jnp.bfloat16 if on_tpu else np.float32
    batch = {
        "features": ds.arrays["features"].astype(feat_dtype),
        "q_ids": ds.arrays["q_ids"],
        "answer_id": ds.arrays["answer_id"],
    }

    mesh = create_mesh(cfg)
    from vqa_transfer_externaldata_tpu.parallel.mesh import (
        batch_sharding, replicated)

    repl, bshard = replicated(mesh), batch_sharding(mesh)
    tx, lr_fn = make_optimizer(cfg)

    params = jax.jit(
        lambda: spec.module.init(
            {"params": jax.random.PRNGKey(0)},
            batch["features"][:1], batch["q_ids"][:1],
            train=False)["params"],
        out_shardings=repl)()
    opt_state = jax.jit(tx.init, out_shardings=repl)(params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt_state, rng=jax.random.PRNGKey(1))
    state = jax.device_put(state, repl)

    def step_fn(state, batch):
        rng, dropout_rng = jax.random.split(state.rng)

        def loss_fn(p):
            out = spec.module.apply({"params": p}, *spec.inputs(batch),
                                    train=True, rngs={"dropout": dropout_rng})
            loss, _ = spec.loss(out, batch)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          opt_state=opt_state, rng=rng), loss

    step = jax.jit(step_fn, in_shardings=(repl, bshard),
                   out_shardings=(repl, repl), donate_argnums=0)
    dev_batch = jax.device_put(batch, bshard)

    # Warmup / compile. Sync via device_get: under the axon TPU relay,
    # block_until_ready returns before execution completes, so a value
    # fetch is the only trustworthy barrier.
    for _ in range(3):
        state, loss = step(state, dev_batch)
    float(jax.device_get(loss))

    n_steps = 32 if on_tpu else 5
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss = step(state, dev_batch)
    float(jax.device_get(loss))
    dt = time.perf_counter() - t0

    n_chips = mesh.devices.size
    qps_per_chip = n_steps * batch_size / dt / n_chips
    vs = (qps_per_chip / ROUND1_BASELINE) if ROUND1_BASELINE else 1.0
    print(json.dumps({
        "metric": "vqa_train_questions_per_sec_per_chip_b256",
        "value": round(qps_per_chip, 2),
        "unit": "questions/sec/chip",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
