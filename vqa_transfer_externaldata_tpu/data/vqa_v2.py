"""VQA v2 preprocessing (reference C2, ``data/tools/vqa_v2``): official
questions/annotations JSON -> training artifacts.

Produces, per split:
- ``vqa_<split>.npz``: q_ids [N, T] int32, q_len [N], answer_id [N]
  (most-common normalized answer mapped to the top-K vocab, <unk> if OOV),
  answer_scores [N, A] (official per-candidate accuracy vectors, eval
  splits), question_id [N], image_index [N] (row into the feature store),
  question_type_id / answer_type_id [N] (rows into ``types.json`` — the
  standard yes/no-number-other and per-question-type accuracy breakdowns).
- ``vocab.json`` / ``answer_vocab.json`` (built on the train split only).
- ``types.json``: the question/answer type name tables.

Tokenization and answer normalization are the golden-tested rules in
utils/vocab.py and utils/metrics.py — these dominate cross-implementation
accuracy deltas (SURVEY.md section 7 hard part (b)).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from vqa_transfer_externaldata_tpu.utils.logging import log
from vqa_transfer_externaldata_tpu.utils.metrics import (
    answer_scores, normalize_answer)
from vqa_transfer_externaldata_tpu.utils.vocab import (
    UNK_ID, Vocab, build_answer_vocab)


def load_questions(path: str) -> List[dict]:
    with open(path) as fh:
        return json.load(fh)["questions"]


def load_annotations(path: str) -> Dict[int, dict]:
    with open(path) as fh:
        return {a["question_id"]: a for a in json.load(fh)["annotations"]}


def build_type_tables(annotations: Dict[int, dict]
                      ) -> Dict[str, List[str]]:
    """Deterministic question/answer type name tables from (train)
    annotations — index 0 is reserved for unseen types."""
    q_types = sorted({a.get("question_type", "") for a in
                      annotations.values()} - {""})
    a_types = sorted({a.get("answer_type", "") for a in
                      annotations.values()} - {""})
    return {"question_types": ["<unk>"] + q_types,
            "answer_types": ["<unk>"] + a_types}


def build_split(
    questions: Sequence[dict],
    annotations: Optional[Dict[int, dict]],
    word_vocab: Vocab,
    answer_vocab: Vocab,
    *,
    max_question_len: int = 26,
    image_id_to_index: Optional[Dict[int, int]] = None,
    with_scores: bool = False,
    type_tables: Optional[Dict[str, List[str]]] = None,
) -> Dict[str, np.ndarray]:
    n = len(questions)
    T = max_question_len
    q_ids = np.zeros((n, T), np.int32)
    q_len = np.zeros((n,), np.int32)
    qid = np.zeros((n,), np.int64)
    image_index = np.zeros((n,), np.int32)
    answer_id = np.full((n,), UNK_ID, np.int32)
    scores = (np.zeros((n, len(answer_vocab)), np.float32)
              if with_scores else None)
    qt_idx = at_idx = None
    if annotations is not None and type_tables is not None:
        qt = {t: i for i, t in enumerate(type_tables["question_types"])}
        at = {t: i for i, t in enumerate(type_tables["answer_types"])}
        qt_idx = np.zeros((n,), np.int32)
        at_idx = np.zeros((n,), np.int32)

    a2i = answer_vocab.token_to_id
    for i, q in enumerate(questions):
        q_ids[i], q_len[i] = word_vocab.encode(q["question"], T)
        qid[i] = q["question_id"]
        if image_id_to_index is not None:
            image_index[i] = image_id_to_index[q["image_id"]]
        if annotations is not None:
            ann = annotations[q["question_id"]]
            # Training target: the most-common (normalized) answer.
            target = normalize_answer(ann["multiple_choice_answer"])
            answer_id[i] = a2i.get(target, UNK_ID)
            if with_scores:
                human = [a["answer"] for a in ann["answers"]]
                scores[i] = answer_scores(human, a2i, len(answer_vocab))
            if qt_idx is not None:
                qt_idx[i] = qt.get(ann.get("question_type", ""), 0)
                at_idx[i] = at.get(ann.get("answer_type", ""), 0)

    out = {"q_ids": q_ids, "q_len": q_len, "question_id": qid,
           "image_index": image_index, "answer_id": answer_id}
    if with_scores:
        out["answer_scores"] = scores
    if qt_idx is not None:
        out["question_type_id"] = qt_idx
        out["answer_type_id"] = at_idx
    return out


def preprocess_vqa_v2(
    out_dir: str,
    train_questions: str,
    train_annotations: str,
    *,
    val_questions: Optional[str] = None,
    val_annotations: Optional[str] = None,
    test_questions: Optional[str] = None,
    top_k_answers: int = 2000,
    max_question_len: int = 26,
    vocab_pad_to: Optional[int] = None,
    image_id_to_index: Optional[Dict[int, int]] = None,
    answer_holdout_fraction: float = 0.0,
    holdout_seed: int = 0,
) -> Tuple[Vocab, Vocab]:
    """Full preprocessing pipeline; returns (word_vocab, answer_vocab).

    ``answer_holdout_fraction`` > 0 reproduces the paper's out-of-vocabulary
    answer protocol: that fraction of the answer vocab is deterministically
    held out of *training* (those training rows get <unk> targets, which the
    loss masks), while eval still scores them — measuring how well the
    pretrained answer-embedding space covers answers never fine-tuned on.
    The held-out ids are saved to ``oov_split.json``.
    """
    if val_questions and not val_annotations:
        raise ValueError(
            "val_questions requires val_annotations (the val split carries "
            "answer targets + score vectors); pass an annotation-less "
            "question file as test_questions instead")
    os.makedirs(out_dir, exist_ok=True)
    tq = load_questions(train_questions)
    ta = load_annotations(train_annotations)
    word_vocab = Vocab.build((q["question"] for q in tq),
                             max_size=vocab_pad_to)
    answer_vocab = build_answer_vocab(
        (ann["multiple_choice_answer"] for ann in ta.values()),
        top_k=top_k_answers)
    word_vocab.save(os.path.join(out_dir, "vocab.json"))
    answer_vocab.save(os.path.join(out_dir, "answer_vocab.json"))
    type_tables = build_type_tables(ta)
    with open(os.path.join(out_dir, "types.json"), "w") as fh:
        json.dump(type_tables, fh)
    log.info("vocab %d words, %d answers; %d question / %d answer types",
             len(word_vocab), len(answer_vocab),
             len(type_tables["question_types"]),
             len(type_tables["answer_types"]))

    holdout_ids = np.zeros((0,), np.int32)
    if answer_holdout_fraction > 0:
        candidates = np.arange(4, len(answer_vocab))  # never the specials
        rng = np.random.default_rng(holdout_seed)
        n_hold = int(round(answer_holdout_fraction * candidates.size))
        holdout_ids = np.sort(rng.choice(candidates, size=n_hold,
                                         replace=False)).astype(np.int32)
        with open(os.path.join(out_dir, "oov_split.json"), "w") as fh:
            json.dump({"oov_ids": holdout_ids.tolist()}, fh)
        log.info("answer holdout: %d/%d answers excluded from training",
                 n_hold, len(answer_vocab))

    splits = [("train", tq, ta, False)]
    if val_questions:
        splits.append(("val", load_questions(val_questions),
                       load_annotations(val_annotations), True))
    if test_questions:
        splits.append(("test", load_questions(test_questions), None, False))
    for name, qs, anns, with_scores in splits:
        arrays = build_split(qs, anns, word_vocab, answer_vocab,
                             max_question_len=max_question_len,
                             image_id_to_index=image_id_to_index,
                             with_scores=with_scores,
                             type_tables=type_tables)
        if name == "train" and holdout_ids.size:
            held = np.isin(arrays["answer_id"], holdout_ids)
            arrays["answer_id"] = np.where(held, UNK_ID,
                                           arrays["answer_id"]).astype(
                                               np.int32)
        path = os.path.join(out_dir, f"vqa_{name}.npz")
        np.savez_compressed(path, **arrays)
        in_vocab = float((arrays["answer_id"] != UNK_ID).mean())
        log.info("%s: %d questions -> %s (%.1f%% answers in vocab)",
                 name, len(qs), path, 100 * in_vocab)
    return word_vocab, answer_vocab


def oov_answer_split(answer_vocab: Vocab, train_answers: Sequence[str]
                     ) -> Dict[str, np.ndarray]:
    """Paper's in-/out-of-vocabulary answer split: marks which answer-vocab
    entries never appear in the (normalized) *training* answers — the OOV
    rows whose embeddings come purely from the pretrained space."""
    seen = {normalize_answer(a) for a in train_answers}
    mask = np.array([t in seen for t in answer_vocab.tokens], bool)
    return {"in_vocab_mask": mask,
            "oov_ids": np.where(~mask)[0].astype(np.int32)}
