"""Visual Genome preprocessing + unsupervised task discovery (reference C1,
``data/tools/visualgenome``): region descriptions -> stage-1 training
artifacts.

The paper's "unsupervised task discovery": visual words (objects/attributes)
are mined from region-description phrases by frequency, then grouped into
*tasks* — semantically-coherent word groups within which the stage-1
classifier must discriminate. Grouping uses WordNet lexicographer classes
(noun.animal, noun.artifact, adj.all, ...) when the corpus is available,
with a deterministic co-occurrence-free frequency-bucket fallback otherwise
(this machine has no WordNet data; both paths are tested).

Two artifact flavors (the reference's ``model_vlmap_*`` dataset family):

- Word-level (``vlmap_<split>.npz``): region_index [N] (row into the
  region feature store), task [N], word [N] (positive word id),
  candidates [N, K] (negative words from the SAME task with the positive
  planted — the discrimination set that makes tasks meaningful), label [N].
- Description-level blanks (``vlmap_desc_<split>.npz``): the same fields
  plus desc_ids [N, T] (the region phrase with the target word replaced by
  ``<unk>``), blank_pos [N], and pattern [N] — the discovered blank kind
  (0 = object blank at the phrase head/end, 1 = attribute blank directly
  modifying a visual word, 2 = relationship blank between visual words).
  These are the paper's attribute/relationship-blank tasks: the model must
  fill the blank from the region's visual evidence *and* the description
  context (models/vlmap.VLMapDescriptionModel).
"""

from __future__ import annotations

import json
import os
from collections import Counter, defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from vqa_transfer_externaldata_tpu.utils.logging import log
from vqa_transfer_externaldata_tpu.utils.vocab import Vocab, tokenize

class CandidateResampler:
    """Wrap a vlmap dataset to redraw negative candidates every batch.

    The stored artifacts carry a fixed (seeded) candidate set; the reference
    era's queue-based samplers drew fresh negatives continuously. This
    wrapper resamples same-task negatives per batch (deterministically from
    a stream seeded by the base seed), planting each row's positive at a
    random position — harder, non-repeating contrast sets.
    """

    def __init__(self, base, task_words: Dict[int, Sequence[int]],
                 num_candidates: int, seed: int = 0,
                 count_vocab_size: int = 0) -> None:
        self.base = base
        self.arrays = base.arrays
        self.size = base.size
        self.pools = {int(t): np.asarray(ids, np.int32)
                      for t, ids in task_words.items()}
        self.K = num_candidates
        self.seed = seed
        # > 0: emit per-batch candidate-multiset counts for the dense
        # training loss (model.dense_candidate_loss) — rebuilt from THIS
        # batch's fresh draw, overwriting any stale stored counts.
        self.count_vocab_size = count_vocab_size

    def __len__(self) -> int:
        return self.size

    def take(self, idx):
        """Evaler path: the stored (fixed, seeded) candidate sets — fresh
        negatives are a training-only concern; eval must be deterministic."""
        return self.base.take(idx)

    def batches(self, batch_size: int, **kw):
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, 0xC0FFEE]))
        for batch in self.base.batches(batch_size, **kw):
            n = batch["word"].shape[0]
            # Every task in the batch must have a pool: a stale or
            # mismatched vlmap_meta.json would otherwise leave those rows'
            # np.empty garbage as "negatives" and train on noise silently.
            unknown = set(np.unique(batch["task"]).tolist()) \
                - self.pools.keys()
            if unknown:
                raise ValueError(
                    f"CandidateResampler: batch tasks {sorted(unknown)} "
                    "have no candidate pool — task_words (vlmap_meta.json) "
                    "does not match this dataset's task table")
            cands = np.empty((n, self.K), np.int32)
            for t, pool in self.pools.items():
                sel = np.where(batch["task"] == t)[0]
                if sel.size:
                    cands[sel] = rng.choice(pool, size=(sel.size, self.K))
            label = rng.integers(0, self.K, size=n).astype(np.int32)
            cands[np.arange(n), label] = batch["word"]
            batch = dict(batch)
            batch["candidates"] = cands
            batch["label"] = label
            if self.count_vocab_size:
                from vqa_transfer_externaldata_tpu.data.datasets import (
                    attach_candidate_counts)

                batch = attach_candidate_counts(
                    {**batch, "candidates": cands, "label": label},
                    self.count_vocab_size)
            yield batch


STOPWORDS = frozenset(
    "a an the of in on at is are was were be been being with and or to "
    "for from by as it its this that these those there here very his her "
    "their our your my he she they we you i".split())


def load_region_descriptions(path: str) -> List[dict]:
    """VG region_descriptions.json -> flat region list
    [{"image_id", "region_id", "phrase", "x", "y", "width", "height"}]."""
    with open(path) as fh:
        data = json.load(fh)
    regions = []
    for image in data:
        image_id = image.get("id", image.get("image_id"))
        for r in image["regions"]:
            regions.append({
                "image_id": image_id, "region_id": r["region_id"],
                "phrase": r["phrase"], "x": r["x"], "y": r["y"],
                "width": r["width"], "height": r["height"]})
    return regions


def mine_visual_words(phrases: Sequence[str], *, min_count: int = 50,
                      max_words: int = 5000) -> List[str]:
    """Frequent non-stopword tokens, deterministic order (count, lex)."""
    counts: Counter = Counter()
    for p in phrases:
        counts.update(t for t in tokenize(p)
                      if t not in STOPWORDS and not t.isdigit())
    items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [w for w, c in items[:max_words] if c >= min_count]


def _wordnet_lexname(word: str) -> Optional[str]:
    """WordNet lexicographer class of the most common noun/adj sense."""
    try:
        from nltk.corpus import wordnet as wn

        for pos in ("n", "a", "s", "v"):
            synsets = wn.synsets(word, pos=pos)
            if synsets:
                return synsets[0].lexname()
    except LookupError:
        return None
    return None


def discover_tasks(words: Sequence[str], num_tasks: int,
                   *, min_task_size: int = 8
                   ) -> Tuple[Dict[str, int], List[str]]:
    """Group visual words into tasks (word -> task id, task names).

    WordNet lexnames when available; otherwise deterministic frequency-rank
    buckets (words is already frequency-ordered). Small groups merge into
    task 0 ("misc") so every task has enough words to discriminate among.
    """
    lexnames = {w: _wordnet_lexname(w) for w in words}
    if any(v is not None for v in lexnames.values()):
        groups: Dict[str, List[str]] = defaultdict(list)
        for w in words:
            groups[lexnames[w] or "misc"].append(w)
        # Largest groups become tasks; the rest merge into "misc".
        ranked = sorted(groups.items(), key=lambda kv: (-len(kv[1]), kv[0]))
        task_names = ["misc"] + [name for name, members in ranked
                                 if name != "misc" and
                                 len(members) >= min_task_size]
        task_names = task_names[:num_tasks]
        index = {name: i for i, name in enumerate(task_names)}
        word_to_task = {
            w: index.get(lexnames[w] or "misc", 0) for w in words}
        log.info("task discovery via WordNet: %d tasks", len(task_names))
        return word_to_task, task_names
    # Fallback: frequency-rank buckets (deterministic, no external data).
    task_names = [f"freq_bucket_{i}" for i in range(num_tasks)]
    word_to_task = {w: i % num_tasks for i, w in enumerate(words)}
    log.info("task discovery fallback: %d frequency buckets", num_tasks)
    return word_to_task, task_names


def build_vlmap_artifacts(
    regions: Sequence[dict],
    word_vocab: Vocab,
    *,
    num_tasks: int = 32,
    num_candidates: int = 512,
    min_word_count: int = 50,
    max_words: int = 5000,
    seed: int = 0,
    out_dir: Optional[str] = None,
    val_fraction: float = 0.05,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Regions -> task-conditional classification examples (both splits)."""
    phrases = [r["phrase"] for r in regions]
    words = mine_visual_words(phrases, min_count=min_word_count,
                              max_words=max_words)
    words = [w for w in words if w in word_vocab.token_to_id]
    word_to_task, task_names = discover_tasks(words, num_tasks)
    task_words: Dict[int, List[int]] = defaultdict(list)
    for w in words:
        task_words[word_to_task[w]].append(word_vocab.token_to_id[w])

    rng = np.random.default_rng(seed)
    rows = []  # (region_index, task, word_id)
    wset = {w: word_vocab.token_to_id[w] for w in words}
    for idx, phrase in enumerate(phrases):
        for tok in set(tokenize(phrase)):
            if tok in wset:
                rows.append((idx, word_to_task[tok], wset[tok]))
    if not rows:
        raise ValueError("no visual-word occurrences found; lower "
                         "min_word_count or check the vocab")
    rows_arr = np.asarray(rows, np.int64)
    n = rows_arr.shape[0]
    K = num_candidates

    candidates = np.zeros((n, K), np.int32)
    label = rng.integers(0, K, size=n).astype(np.int32)
    for t, ids in task_words.items():
        sel = np.where(rows_arr[:, 1] == t)[0]
        if sel.size == 0:
            continue
        pool = np.asarray(ids, np.int32)
        # Same-task negatives (with replacement if the task is small).
        candidates[sel] = rng.choice(pool, size=(sel.size, K))
    candidates[np.arange(n), label] = rows_arr[:, 2].astype(np.int32)

    order = rng.permutation(n)
    n_val = max(1, int(n * val_fraction)) if n > 1 else 0
    splits = {"train": order[n_val:], "val": order[:n_val]}
    out = {}
    for name, sel in splits.items():
        if sel.size == 0:
            continue
        arrays = {
            "region_index": rows_arr[sel, 0].astype(np.int32),
            "task": rows_arr[sel, 1].astype(np.int32),
            "word": rows_arr[sel, 2].astype(np.int32),
            "candidates": candidates[sel],
            "label": label[sel],
        }
        out[name] = arrays
        if out_dir is not None:
            os.makedirs(out_dir, exist_ok=True)
            np.savez_compressed(
                os.path.join(out_dir, f"vlmap_{name}.npz"), **arrays)
    if out_dir is not None:
        # Region metadata aligned with region_index (row r = region r):
        # cli.extract --regions drives the crop-level feature extraction
        # from this, producing the store stage-1 training joins against.
        np.savez_compressed(
            os.path.join(out_dir, "region_meta.npz"),
            image_id=np.asarray([r["image_id"] for r in regions], np.int64),
            bbox=np.asarray([[r["x"], r["y"], r["width"], r["height"]]
                             for r in regions], np.int32))
    meta = {"task_names": task_names,
            "num_examples": int(n), "num_words": len(words),
            # word-id pools per task: lets training resample fresh
            # negatives every epoch (CandidateResampler) instead of
            # reusing the fixed preprocessing-time candidate sets
            "task_words": {str(t): [int(w) for w in ids]
                           for t, ids in task_words.items()}}
    if out_dir is not None:
        with open(os.path.join(out_dir, "vlmap_meta.json"), "w") as fh:
            json.dump(meta, fh)
    log.info("vlmap artifacts: %d examples, %d visual words, %d tasks",
             n, len(words), len(task_names))
    return out


PATTERN_NAMES = ("object", "attribute", "relationship")


def classify_blank_pattern(tokens: Sequence[str], pos: int,
                           visual: frozenset) -> int:
    """Discovered blank kind for ``tokens[pos]`` (index into
    :data:`PATTERN_NAMES`): an *object* blank sits at the content tail of
    the phrase, an *attribute* blank directly modifies a following visual
    word, and anything else sandwiched in context is a *relationship*
    blank. Deterministic and corpus-free — the positional analogue of the
    reference's WordNet-guided description-task grouping."""
    content = [i for i, t in enumerate(tokens)
               if t not in STOPWORDS and not t.isdigit()]
    if not content or pos == content[-1]:
        return 0
    if pos + 1 < len(tokens) and tokens[pos + 1] in visual:
        return 1
    return 2


def build_vlmap_description_artifacts(
    regions: Sequence[dict],
    word_vocab: Vocab,
    *,
    num_tasks: int = 32,
    num_candidates: int = 512,
    min_word_count: int = 50,
    max_words: int = 5000,
    max_desc_len: int = 26,
    seed: int = 0,
    out_dir: Optional[str] = None,
    val_fraction: float = 0.05,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Description-level blank-fill examples (``vlmap_desc_<split>.npz``).

    One example per (region phrase, visual-word occurrence): the word is
    blanked out of the tokenized phrase (``<unk>`` at ``blank_pos``) and
    becomes the positive among same-task candidates; the model sees the
    region feature AND the blanked description (reference C6's description
    encoder variants; SURVEY.md section 0 "unsupervised task discovery").
    """
    from vqa_transfer_externaldata_tpu.utils.vocab import PAD_ID, UNK_ID

    phrases = [r["phrase"] for r in regions]
    words = mine_visual_words(phrases, min_count=min_word_count,
                              max_words=max_words)
    words = [w for w in words if w in word_vocab.token_to_id]
    word_to_task, task_names = discover_tasks(words, num_tasks)
    task_words: Dict[int, List[int]] = defaultdict(list)
    for w in words:
        task_words[word_to_task[w]].append(word_vocab.token_to_id[w])
    visual = frozenset(words)

    T = max_desc_len
    rng = np.random.default_rng(seed)
    rows: List[Tuple[int, int, int, int, int]] = []
    desc_rows: List[np.ndarray] = []
    for idx, phrase in enumerate(phrases):
        tokens = tokenize(phrase)[:T]
        ids = np.full((T,), PAD_ID, np.int32)
        for j, t in enumerate(tokens):
            ids[j] = word_vocab.token_to_id.get(t, UNK_ID)
        seen = set()
        for pos, tok in enumerate(tokens):
            if tok not in visual or tok in seen:
                continue
            seen.add(tok)
            pattern = classify_blank_pattern(tokens, pos, visual)
            rows.append((idx, word_to_task[tok],
                         word_vocab.token_to_id[tok], pos, pattern))
            blanked = ids.copy()
            blanked[pos] = UNK_ID
            desc_rows.append(blanked)
    if not rows:
        raise ValueError("no blankable visual-word occurrences found; "
                         "lower min_word_count or check the vocab")
    rows_arr = np.asarray(rows, np.int64)
    desc_ids = np.stack(desc_rows)
    n = rows_arr.shape[0]
    K = num_candidates

    candidates = np.zeros((n, K), np.int32)
    label = rng.integers(0, K, size=n).astype(np.int32)
    for t, ids_ in task_words.items():
        sel = np.where(rows_arr[:, 1] == t)[0]
        if sel.size == 0:
            continue
        candidates[sel] = rng.choice(np.asarray(ids_, np.int32),
                                     size=(sel.size, K))
    candidates[np.arange(n), label] = rows_arr[:, 2].astype(np.int32)

    order = rng.permutation(n)
    n_val = max(1, int(n * val_fraction)) if n > 1 else 0
    splits = {"train": order[n_val:], "val": order[:n_val]}
    out = {}
    for name, sel in splits.items():
        if sel.size == 0:
            continue
        arrays = {
            "region_index": rows_arr[sel, 0].astype(np.int32),
            "task": rows_arr[sel, 1].astype(np.int32),
            "word": rows_arr[sel, 2].astype(np.int32),
            "desc_ids": desc_ids[sel],
            "blank_pos": rows_arr[sel, 3].astype(np.int32),
            "pattern": rows_arr[sel, 4].astype(np.int32),
            "candidates": candidates[sel],
            "label": label[sel],
        }
        out[name] = arrays
        if out_dir is not None:
            os.makedirs(out_dir, exist_ok=True)
            np.savez_compressed(
                os.path.join(out_dir, f"vlmap_desc_{name}.npz"), **arrays)
    counts = np.bincount(rows_arr[:, 4], minlength=3)
    meta = {"task_names": task_names,
            "pattern_names": list(PATTERN_NAMES),
            "pattern_counts": {PATTERN_NAMES[i]: int(c)
                               for i, c in enumerate(counts)},
            "num_examples": int(n), "num_words": len(words),
            "task_words": {str(t): [int(w) for w in ids_]
                           for t, ids_ in task_words.items()}}
    if out_dir is not None:
        with open(os.path.join(out_dir, "vlmap_desc_meta.json"), "w") as fh:
            json.dump(meta, fh)
    log.info("vlmap_desc artifacts: %d blanks (%s), %d words, %d tasks",
             n, dict(meta["pattern_counts"]), len(words), len(task_names))
    return out
