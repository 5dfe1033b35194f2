"""Evaler (reference C11): restore a checkpoint, run a full split, emit the
official-format VQA result JSON (``[{"question_id": ..., "answer": ...}]``)
plus accuracy — kept format-compatible so results drop into the official
VQA evaluation server / eval code unchanged (SURVEY.md section 5)."""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from vqa_transfer_externaldata_tpu.data.datasets import ArrayDataset
from vqa_transfer_externaldata_tpu.parallel.trainer import Trainer, TrainState
from vqa_transfer_externaldata_tpu.utils.logging import log
from vqa_transfer_externaldata_tpu.utils.vocab import Vocab


def padded_batches(ds: ArrayDataset, batch_size: int
                   ) -> Tuple[Iterator[Dict[str, np.ndarray]], int]:
    """Deterministic single-epoch batches covering EVERY row: the final
    partial batch is padded by repeating row 0 (static shapes for jit), and
    the caller trims predictions back to ``len(ds)``. Padded rows get
    ``answer_id = <unk>`` so the masked VQA loss/accuracy exclude them from
    the in-loop eval means (split-level vqa_accuracy is recomputed exactly
    from the score table either way).

    Rows are materialized through ``ds.take`` — the single point where lazy
    columns (JoinedDataset's feature-store join) attach — so feature-backed
    runs evaluate identically to in-memory ones."""
    from vqa_transfer_externaldata_tpu.utils.vocab import UNK_ID

    n = len(ds)
    pad = (-n) % batch_size

    def gen():
        for start in range(0, n + pad, batch_size):
            stop = min(start + batch_size, n)
            idx = np.arange(start, stop)
            if stop - start < batch_size:  # pad the tail with row 0
                idx = np.concatenate(
                    [idx, np.zeros(batch_size - idx.size, idx.dtype)])
            batch = ds.take(idx)
            mask = np.ones((batch_size,), np.float32)
            if stop - start < batch_size:
                mask[stop - start:] = 0.0
                if "answer_id" in batch:
                    batch["answer_id"] = batch["answer_id"].copy()
                    batch["answer_id"][stop - start:] = UNK_ID
            batch["example_mask"] = mask
            yield batch

    return gen(), n


def evaluate_split(trainer: Trainer, state: TrainState, ds: ArrayDataset,
                   *, answer_vocab: Optional[Vocab] = None,
                   question_ids: Optional[np.ndarray] = None,
                   results_path: Optional[str] = None,
                   oov_answer_ids: Optional[np.ndarray] = None,
                   type_tables: Optional[Dict[str, list]] = None
                   ) -> Tuple[Dict[str, float], np.ndarray]:
    """Evaluate every row of ``ds``; optionally dump official result JSON.

    ``oov_answer_ids``: answer-vocab ids absent from the training answers
    (data/vqa_v2.oov_answer_split) — reports the paper's in-/out-of-
    vocabulary accuracy breakdown, the headline measure of how well the
    pretrained answer-embedding space generalizes to unseen answers.

    ``type_tables``: ``types.json`` content from preprocessing — adds the
    standard per-answer-type (yes/no - number - other) and per-question-
    type accuracy breakdowns (SURVEY.md section 3.3) when the split
    carries ``answer_type_id``/``question_type_id``.
    """
    n = len(ds)
    if trainer.cfg.train.device_data_cache:
        # Device-resident full-split eval: data uploads once, the whole
        # padded index epoch is ONE device program (2 host round trips
        # instead of 3-4 per batch — decisive on a high-latency host
        # link). Tested equal to the streaming path incl. tail padding.
        metrics, preds = trainer.evaluate_resident(state, ds)
    else:
        batches, n = padded_batches(ds, trainer.cfg.train.batch_size)
        metrics, preds = trainer.evaluate(state, batches)
        preds = preds[:n]
    # Exact split-level VQA accuracy from the precomputed score table
    # (utils/metrics.answer_scores), without padded-row dilution.
    if "answer_scores" in ds.arrays:
        from vqa_transfer_externaldata_tpu.utils.metrics import per_question_scores

        per_q = per_question_scores(preds, np.asarray(ds.arrays
                                                      ["answer_scores"][:n]))
        metrics["vqa_accuracy"] = float(per_q.mean())
        if oov_answer_ids is not None and "answer_id" in ds.arrays:
            from vqa_transfer_externaldata_tpu.utils.vocab import UNK_ID

            gt = np.asarray(ds.arrays["answer_id"][:n])
            oov = np.isin(gt, oov_answer_ids)
            # Rows whose ground truth is outside the answer vocab entirely
            # (answer_id == <unk>) are NEITHER in-vocab nor held-out:
            # excluding them keeps the paper's in-vs-OOV comparison from
            # being diluted by unanswerable rows.
            in_vocab = ~oov & (gt != UNK_ID)
            if oov.any():
                metrics["vqa_accuracy_oov_answers"] = float(
                    per_q[oov].mean())
            if in_vocab.any():
                metrics["vqa_accuracy_in_vocab_answers"] = float(
                    per_q[in_vocab].mean())
        if type_tables is not None:
            for id_key, names_key, prefix in (
                    ("answer_type_id", "answer_types",
                     "vqa_accuracy_answer_type"),
                    ("question_type_id", "question_types",
                     "vqa_accuracy_question_type")):
                if id_key not in ds.arrays:
                    continue
                ids = np.asarray(ds.arrays[id_key][:n])
                for t, name in enumerate(type_tables[names_key]):
                    sel = ids == t
                    if sel.any():
                        slug = name.replace(" ", "_").replace("/", "_")
                        metrics[f"{prefix}/{slug}"] = float(
                            per_q[sel].mean())
    if results_path is not None:
        if answer_vocab is None:
            raise ValueError("answer_vocab required to decode results")
        qids = (question_ids if question_ids is not None
                else ds.arrays.get("question_id",
                                   np.arange(n, dtype=np.int64)))
        results: List[dict] = [
            {"question_id": int(qids[i]),
             "answer": answer_vocab.tokens[int(preds[i])]}
            for i in range(n)
        ]
        os.makedirs(os.path.dirname(os.path.abspath(results_path)),
                    exist_ok=True)
        with open(results_path, "w") as fh:
            json.dump(results, fh)
        log.info("wrote %d results to %s", n, results_path)
    return metrics, preds
