"""Evaluation entrypoint (reference: ``vqa/evaler.py`` / ``vlmap/evaler.py``
— SURVEY.md section 3.3): restore a checkpoint, run a full split, print
metrics, and (for VQA) dump the official-format result JSON.

    python -m vqa_transfer_externaldata_tpu.cli.eval \
        --train.train_dir <dir> [--model.model vqa_attention] \
        [--eval_split val] [--results_path <dir>/results.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional, Sequence

import jax

from vqa_transfer_externaldata_tpu.cli.common import build_spec
from vqa_transfer_externaldata_tpu.config import Config
from vqa_transfer_externaldata_tpu.parallel.mesh import (
    initialize_distributed_from)
from vqa_transfer_externaldata_tpu.data.datasets import load_dataset
from vqa_transfer_externaldata_tpu.parallel.evaler import evaluate_split
from vqa_transfer_externaldata_tpu.parallel.trainer import Trainer
from vqa_transfer_externaldata_tpu.utils.logging import log


def main(argv: Optional[Sequence[str]] = None) -> dict:
    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--eval_split", default="val")
    extra.add_argument("--results_path", default=None)
    extra.add_argument("--checkpoint_step", type=int, default=None)
    eargs, rest = extra.parse_known_args(argv)
    cfg = Config.from_args(rest)

    train_dir = cfg.train.train_dir
    cfg_path = os.path.join(train_dir, "config.json")
    if os.path.exists(cfg_path):
        # Adopt the run's recorded config (model/dims), then re-apply the
        # flags actually present on this command line so they still win.
        with open(cfg_path) as fh:
            saved = json.load(fh)
        flat = {f"{s}.{k}": v for s, sec in saved.items()
                for k, v in sec.items()}
        cfg = Config().replace_flat(flat)
        cfg = _apply_explicit(cfg, rest)
        cfg = cfg.replace_flat({"train.train_dir": train_dir})
    initialize_distributed_from(cfg)

    spec, word_vocab, answer_vocab = build_spec(cfg)
    ds = load_dataset(cfg, eargs.eval_split, stage=spec.stage)
    trainer = Trainer(cfg, spec, train_dir=train_dir)
    example = next(ds.batches(1, epochs=1, shuffle=False))
    state = trainer.init_state(example)
    state = trainer.restore(state, step=eargs.checkpoint_step)
    log.info("evaluating %s/%s at step %d (%d examples)", spec.stage,
             eargs.eval_split, int(jax.device_get(state.step)), len(ds))

    results_path = eargs.results_path
    if results_path is None and spec.stage == "vqa":
        results_path = os.path.join(
            train_dir, f"results_{eargs.eval_split}.json")
    oov_ids = None
    oov_path = os.path.join(cfg.data.dataset_dir, "oov_split.json")
    if os.path.exists(oov_path):
        import numpy as np

        with open(oov_path) as fh:
            oov_ids = np.asarray(json.load(fh)["oov_ids"], np.int32)
    type_tables = None
    types_path = os.path.join(cfg.data.dataset_dir, "types.json")
    if os.path.exists(types_path):
        with open(types_path) as fh:
            type_tables = json.load(fh)
    metrics, _ = evaluate_split(trainer, state, ds,
                                answer_vocab=answer_vocab,
                                results_path=results_path,
                                oov_answer_ids=oov_ids,
                                type_tables=type_tables)
    print(json.dumps({"split": eargs.eval_split,
                      "step": int(jax.device_get(state.step)),
                      **{k: round(float(v), 6) for k, v in metrics.items()}}))
    trainer.close()
    return metrics


def _apply_explicit(cfg: Config, argv: Sequence[str]) -> Config:
    """Re-apply only the section.field flags actually present on argv."""
    parsed = Config.from_args(argv)
    overrides = {}
    for tok in argv:
        if not (tok.startswith("--") and "." in tok):
            continue
        key = tok[2:].split("=")[0]
        section, _, field = key.partition(".")
        try:
            overrides[key] = getattr(getattr(parsed, section), field)
        except AttributeError:
            continue
    return cfg.replace_flat(overrides)


if __name__ == "__main__":
    main(sys.argv[1:])
