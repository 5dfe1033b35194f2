"""Training entrypoint for BOTH stages (reference: ``vlmap/trainer.py`` and
``vqa/trainer.py`` — SURVEY.md sections 3.1/3.2; here one CLI dispatched by
``--model.model``):

    # stage 1 (visual-word pretraining)
    python -m vqa_transfer_externaldata_tpu.cli.train --model.model vlmap ...
    # stage 2 (VQA transfer; --train.pretrained_param_path = stage-1 params)
    python -m vqa_transfer_externaldata_tpu.cli.train \
        --model.model vqa_attention \
        --train.pretrained_param_path <dir>/params_final ...

Auto-resumes from the latest checkpoint in the train dir unless
``--train.resume false``.
"""

from __future__ import annotations

import os
import sys
from typing import Optional, Sequence

import jax

from vqa_transfer_externaldata_tpu.cli.common import (
    build_spec, load_resnet_backbone, resolve_train_dir)
from vqa_transfer_externaldata_tpu.config import Config
from vqa_transfer_externaldata_tpu.data.datasets import load_dataset
from vqa_transfer_externaldata_tpu.parallel.evaler import padded_batches
from vqa_transfer_externaldata_tpu.parallel.mesh import (
    initialize_distributed_from)
from vqa_transfer_externaldata_tpu.parallel.trainer import Trainer
from vqa_transfer_externaldata_tpu.utils.checkpoint import (
    load_params, save_params, transfer_init)
from vqa_transfer_externaldata_tpu.utils.logging import log


def main(argv: Optional[Sequence[str]] = None) -> str:
    cfg = Config.from_args(argv)
    initialize_distributed_from(cfg)
    spec, word_vocab, answer_vocab = build_spec(cfg)
    train_dir = resolve_train_dir(cfg, spec.stage)
    os.makedirs(train_dir, exist_ok=True)
    with open(os.path.join(train_dir, "config.json"), "w") as fh:
        fh.write(cfg.to_json())
    log.info("train_dir: %s  devices: %s", train_dir, jax.devices())

    train_ds = load_dataset(cfg, "train", stage=spec.stage)
    try:
        val_ds = load_dataset(cfg, "val", stage=spec.stage)
    except FileNotFoundError:
        val_ds = None

    trainer = Trainer(cfg, spec, train_dir=train_dir)
    example = next(train_ds.batches(1, epochs=1, shuffle=False))
    state = trainer.init_state(example)

    # Pretrained frozen extractor for the raw-image model (BASELINE
    # config 5): graft converted torchvision weights + BN statistics into
    # the freshly-initialized tree.
    backbone = load_resnet_backbone(cfg)
    if backbone is not None:
        bb_params, bb_stats = backbone
        host_params = jax.device_get(state.params)
        host_params["resnet"] = bb_params
        host_extra = jax.device_get(state.extra_vars)
        host_extra["batch_stats"] = dict(host_extra.get("batch_stats", {}))
        host_extra["batch_stats"]["resnet"] = bb_stats
        state = trainer.init_state(example, params=host_params,
                                   extra_vars=host_extra)

    # Cross-stage transfer init (reference C12) — before any resume so a
    # resumed run keeps its trained values instead of re-seeding.
    if cfg.train.pretrained_param_path:
        if spec.stage != "vqa":
            raise ValueError("--train.pretrained_param_path only applies to "
                             "stage-2 (vqa) models")
        pretrained = load_params(cfg.train.pretrained_param_path)
        if "params" in pretrained:
            pretrained = pretrained["params"]
        host_params = jax.device_get(state.params)
        new_params = transfer_init(host_params, pretrained,
                                   word_vocab, answer_vocab)
        state = trainer.init_state(
            example, params=new_params,
            extra_vars=jax.device_get(state.extra_vars))
        log.info("answer-embedding transfer init applied from %s",
                 cfg.train.pretrained_param_path)

    resumed = False
    if cfg.train.resume and trainer.ckpt.latest_step() is not None:
        state = trainer.restore(state)
        resumed = True
        log.info("resumed from step %d", int(jax.device_get(state.step)))

    eval_fn = None
    if val_ds is not None:
        eval_fn = lambda: padded_batches(val_ds, cfg.train.batch_size)[0]
    from vqa_transfer_externaldata_tpu.data.datasets import ArrayDataset
    from vqa_transfer_externaldata_tpu.data.features import JoinedDataset

    if cfg.data.input_pipeline == "grain":
        # Deterministic, checkpointable grain pipeline (SURVEY.md section
        # 7 step 7 — the config-5 production input): per-epoch shuffle +
        # (optionally multi-process) decode; the iterator state persists
        # next to each Orbax checkpoint so resume is sample-exact.
        from vqa_transfer_externaldata_tpu.data.grain_loader import (
            GrainTrainIterator)

        if cfg.train.device_data_cache:
            log.warning("input_pipeline=grain streams batches; "
                        "device_data_cache is ignored")
        train_iter = GrainTrainIterator(
            train_ds, batch_size=cfg.train.batch_size, seed=cfg.train.seed,
            workers=cfg.data.grain_workers,
            shard=(jax.process_index(), jax.process_count()))
        if resumed:
            it_state = trainer.ckpt.restore_data_iter()
            if it_state is not None:
                train_iter.set_state(it_state)
                log.info("grain iterator state restored: %s", it_state)
        state = trainer.fit(train_iter, state, eval_batches_fn=eval_fn)
    elif cfg.train.device_data_cache and (
            type(train_ds) is ArrayDataset
            or isinstance(train_ds, JoinedDataset)):
        # Whole dataset uploaded once (for JoinedDataset: question table +
        # deduplicated feature store, joined by an on-device gather);
        # per-step traffic = batch indices. The val split rides along
        # device-resident too when it exists.
        state = trainer.fit_resident(train_ds, state,
                                     eval_batches_fn=eval_fn,
                                     eval_ds=val_ds)
    else:
        if cfg.train.device_data_cache:
            log.warning("device_data_cache requires an ArrayDataset or "
                        "JoinedDataset (got %s); streaming batches instead",
                        type(train_ds).__name__)
        # Multi-host data parallelism: each process consumes a disjoint
        # stride of the identically-seeded epoch permutation (single
        # host: no-op).
        shard = ((jax.process_index(), jax.process_count())
                 if jax.process_count() > 1 else None)
        batches = train_ds.batches(cfg.train.batch_size,
                                   seed=cfg.train.seed, shard=shard)
        state = trainer.fit(batches, state, eval_batches_fn=eval_fn)

    # Publish final params as a standalone artifact for transfer/eval.
    # Non-trainable collections (frozen BN stats for the raw-image model)
    # ride along so serving restores the exact trained-state forward.
    final_path = os.path.join(train_dir, "params_final")
    payload = {"params": jax.device_get(state.params)}
    extra = jax.device_get(state.extra_vars)
    if extra:
        payload["extra_vars"] = extra
    save_params(final_path, payload)
    log.info("final params saved to %s", final_path)
    trainer.close()
    return train_dir


if __name__ == "__main__":
    main(sys.argv[1:])
