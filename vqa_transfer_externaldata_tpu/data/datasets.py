"""Datasets + input pipeline (reference C5/C7: HDF5-backed ``Dataset`` +
TF1 queue/feed ``create_ops`` batching — SURVEY.md section 2).

The rebuild replaces TF1 queues with a deterministic host-side batcher over
in-memory (or HDF5-backed) arrays: epochs are seeded permutations, batches
are fixed-shape numpy dicts, and the trainer moves them to device with the
mesh's batch sharding (parallel/trainer.py). Static shapes throughout —
drop-remainder batching keeps every jit step identical.

Synthetic corpora generate shape-identical data with a *learnable* signal
(answer depends on features+question through a fixed random projection) so
train-loop tests and benchmarks can assert loss decrease without the real
VQA v2 / Visual Genome artifacts (SURVEY.md section 4).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, Optional

import numpy as np

from vqa_transfer_externaldata_tpu.config import Config


class ArrayDataset:
    """Dict-of-arrays dataset with seeded shuffling + drop-last batching."""

    def __init__(self, arrays: Dict[str, np.ndarray]) -> None:
        sizes = {k: v.shape[0] for k, v in arrays.items()}
        assert len(set(sizes.values())) == 1, f"ragged arrays: {sizes}"
        self.arrays = arrays
        self.size = next(iter(sizes.values()))

    def __len__(self) -> int:
        return self.size

    def take(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        """Materialize the rows at ``idx`` as a batch dict. Subclasses with
        lazy columns (JoinedDataset's feature join) override this — it is
        the single row-materialization point every batch path goes through
        (batches, padded_batches, the evaler)."""
        return {k: v[idx] for k, v in self.arrays.items()}

    def batches(self, batch_size: int, *, shuffle: bool = True,
                seed: int = 0, epochs: Optional[int] = None,
                drop_last: bool = True,
                shard: Optional[tuple] = None
                ) -> Iterator[Dict[str, np.ndarray]]:
        """Yield fixed-shape batches; infinite if ``epochs`` is None.

        ``shard=(k, n)``: multi-host data parallelism — process k of n
        takes every n-th row of the (identically-seeded) epoch permutation
        (trimmed to a multiple of n so every process sees the same batch
        count) and yields its ``batch_size / n`` LOCAL rows of each global
        batch; ``batch_size`` stays the GLOBAL batch everywhere (the
        trainer assembles the global array from process-local rows —
        parallel/mesh.put_sharded), matching fit_resident's convention.
        """
        for idx in self.index_batches(batch_size, shuffle=shuffle,
                                      seed=seed, epochs=epochs,
                                      drop_last=drop_last, shard=shard):
            yield self.take(idx)

    def index_batches(self, batch_size: int, *, shuffle: bool = True,
                      seed: int = 0, epochs: Optional[int] = None,
                      drop_last: bool = True,
                      shard: Optional[tuple] = None
                      ) -> Iterator[np.ndarray]:
        """The index stream behind :meth:`batches` — used directly by the
        device-resident training path (only indices cross the host link)."""
        if drop_last and self.size < batch_size:
            raise ValueError(
                f"dataset has {self.size} rows < batch_size {batch_size} "
                f"with drop_last: no batch can ever be produced")
        local_bs = batch_size
        if shard is not None and shard[1] > 1:
            if batch_size % shard[1]:
                raise ValueError(f"global batch {batch_size} not divisible "
                                 f"by process count {shard[1]}")
            local_bs = batch_size // shard[1]
        epoch = 0
        while epochs is None or epoch < epochs:
            if shuffle:
                order = np.random.default_rng(
                    np.random.SeedSequence([seed, epoch])).permutation(
                        self.size)
            else:
                order = np.arange(self.size)
            if shard is not None and shard[1] > 1:
                k, n = shard
                # Trim to a multiple of n BEFORE striding so every
                # process's slice has the same length — unequal slices
                # would desync batch counts (and epoch boundaries) across
                # processes, hanging a multi-host step.
                order = order[:(order.size // n) * n][k::n]
            limit = (order.size // local_bs) * local_bs if drop_last \
                else order.size
            for start in range(0, limit, local_bs):
                yield order[start:start + local_bs].astype(np.int32)
            epoch += 1

    def save(self, path: str) -> None:
        np.savez_compressed(path, **self.arrays)

    @classmethod
    def load(cls, path: str) -> "ArrayDataset":
        if path.endswith((".h5", ".hdf5")):
            import h5py

            with h5py.File(path, "r") as f:
                return cls({k: np.asarray(f[k]) for k in f.keys()})
        with np.load(path) as f:
            return cls({k: f[k] for k in f.files})


# ---------------------------------------------------------------------------
# Synthetic corpora (tests / benchmarks without the real datasets)
# ---------------------------------------------------------------------------


def _synth_cache_path(tag: str, cfg: Config, n: int, seed: int,
                      extra: str = "") -> str:
    d = cfg.data
    key = (f"{tag}2_n{n}_s{seed}_v{d.vocab_size}_a{d.num_answers}"
           f"_g{d.grid_h}x{d.grid_w}_f{d.feature_dim}_p{d.pool5_dim}"
           f"_t{d.max_question_len}_m{cfg.model.model}"
           f"_k{cfg.model.num_candidates}_nt{cfg.model.num_tasks}{extra}")
    root = os.environ.get("VQA_SYNTH_CACHE",
                          os.path.expanduser("~/.cache/vqa_synth"))
    return os.path.join(root, key)  # directory of mmap-able .npy files


def synthetic_vqa(cfg: Config, *, size: Optional[int] = None,
                  seed: int = 0, with_grid: bool = True,
                  with_scores: bool = False) -> ArrayDataset:
    """Shape-identical synthetic VQA data with a learnable mapping.

    answer_id = argmax over a fixed random projection of the true signal
    (mean grid feature + bag of question embeddings), so any model that sees
    the inputs can drive the CE loss well below chance.

    Generated datasets are cached under ``~/.cache/vqa_synth`` — this host's
    throughput is wildly variable (identical generation measured 18s..129s
    under tenant contention), so repeat runs (benchmarks!) must not pay it.
    """
    d = cfg.data
    n = size or d.synthetic_size
    cache = _synth_cache_path("vqa", cfg, n, seed,
                              extra=f"_wg{with_grid}_ws{with_scores}")
    if n >= 256 and os.path.isdir(cache):
        # mmap-backed lazy load: the batcher touches only the rows it uses.
        arrays = {os.path.splitext(f)[0]: np.load(
            os.path.join(cache, f), mmap_mode="r")
            for f in sorted(os.listdir(cache)) if f.endswith(".npy")}
        return ArrayDataset(arrays)
    rng = np.random.default_rng(seed)
    N = d.grid_h * d.grid_w
    q_len = rng.integers(3, d.max_question_len + 1, size=n)
    q_ids = np.zeros((n, d.max_question_len), np.int32)
    for i, L in enumerate(q_len):
        q_ids[i, :L] = rng.integers(4, d.vocab_size, size=L)

    pool5 = rng.standard_normal((n, d.pool5_dim), dtype=np.float32)
    arrays: Dict[str, np.ndarray] = {"q_ids": q_ids, "pool5": pool5}
    if cfg.model.model == "vqa_end2end":
        arrays["images"] = rng.integers(
            0, 256, size=(n, d.image_size, d.image_size, 3)).astype(np.uint8)
    elif with_grid:
        # Low-rank expansion: drawing n*N*C gaussians is host-RNG-bound
        # (minutes at production sizes on slow hosts); a thin factor times
        # a fixed mixing matrix gives full-size, full-variance features in
        # one BLAS call. Channel correlations are irrelevant here — the
        # learnable signal rides on pool5.
        rank = 32
        thin = rng.standard_normal((n * N, rank), dtype=np.float32)
        mix = np.random.default_rng(99).standard_normal(
            (rank, d.feature_dim), dtype=np.float32)
        mix /= np.float32(np.sqrt(rank))  # f32 scalar: avoid f64 promotion
        grid = (thin @ mix).reshape(n, N, d.feature_dim)
        grid += pool5[:, None, : d.feature_dim]  # grid agrees with pool5
        arrays["features"] = grid

    # Learnable answer: a fixed projection of pool5 (the question ids are
    # inputs but not part of the target — any model that sees the visual
    # features can drive the CE loss well below chance).
    proj_v = np.random.default_rng(1234).standard_normal(
        (d.pool5_dim, d.num_answers), dtype=np.float32)
    score = pool5 @ proj_v
    # answers 4.. (skip specials); never <unk>
    answer = 4 + (np.argmax(score, axis=1) % (d.num_answers - 4))
    arrays["answer_id"] = answer.astype(np.int32)
    if with_scores:
        scores = np.zeros((n, d.num_answers), np.float32)
        scores[np.arange(n), answer] = 1.0
        arrays["answer_scores"] = scores
    ds = ArrayDataset(arrays)
    if n >= 256:
        tmp = cache + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        for k, v in arrays.items():
            np.save(os.path.join(tmp, f"{k}.npy"), v)
        os.replace(tmp, cache)
    return ds


def attach_candidate_counts(arrays: Dict[str, np.ndarray],
                            vocab_size: int) -> Dict[str, np.ndarray]:
    """Dense-candidate-loss inputs (``model.dense_candidate_loss``): per-row
    candidate MULTISET counts ``cand_counts`` [N, V] uint8/uint16 plus the
    positive ``word`` column (= candidates[label]) if absent. Counts carry
    with-replacement duplicates, so the count-weighted dense CE is exactly
    the K-candidate CE (models/vlmap._vlmap_dense_loss)."""
    cand = np.asarray(arrays["candidates"])
    n, K = cand.shape
    if K > np.iinfo(np.uint16).max:  # count cap; K is the max multiplicity
        raise ValueError(f"num_candidates={K} overflows uint16 counts")
    # K bounds the max multiplicity, so uint8 suffices (and halves the
    # [N, V] resident array) whenever K < 256.
    dtype = np.uint8 if K < 256 else np.uint16
    counts = np.zeros((n, vocab_size), dtype)
    # bincount over row-flattened ids: ~20x faster than np.add.at for the
    # 2M-increment bench shape; chunked so the int64 bin buffer stays
    # ~64 MB (chunk_rows * V bins * 8 B).
    chunk = max(1, (1 << 23) // max(vocab_size, 1))
    for i in range(0, n, chunk):
        c = cand[i:i + chunk]
        flat = c.astype(np.int64) + \
            np.arange(c.shape[0], dtype=np.int64)[:, None] * vocab_size
        counts[i:i + chunk] = np.bincount(
            flat.ravel(), minlength=c.shape[0] * vocab_size
        ).reshape(c.shape[0], vocab_size).astype(dtype)
    out = dict(arrays)
    out["cand_counts"] = counts
    if "word" not in out:
        out["word"] = cand[np.arange(n), np.asarray(arrays["label"])] \
            .astype(np.int32)
    return out


def synthetic_vlmap(cfg: Config, *, size: Optional[int] = None,
                    seed: int = 0) -> ArrayDataset:
    """Synthetic stage-1 data: region feature determines the positive word
    through a fixed projection; candidates are a random negative set with the
    positive planted at a random index."""
    d, m = cfg.data, cfg.model
    n = size or d.synthetic_size
    K = m.num_candidates
    rng = np.random.default_rng(seed)
    feature = rng.standard_normal((n, d.pool5_dim), dtype=np.float32)
    task = rng.integers(0, m.num_tasks, size=n).astype(np.int32)
    proj = np.random.default_rng(42).standard_normal(
        (d.pool5_dim, d.vocab_size), dtype=np.float32)
    positive = 4 + (np.argmax(feature @ proj, axis=1) % (d.vocab_size - 4))
    candidates = rng.integers(4, d.vocab_size, size=(n, K)).astype(np.int32)
    label = rng.integers(0, K, size=n).astype(np.int32)
    candidates[np.arange(n), label] = positive
    arrays = {"feature": feature, "task": task,
              "candidates": candidates, "label": label.astype(np.int32)}
    if m.dense_candidate_loss:
        arrays = attach_candidate_counts(arrays, d.vocab_size)
    return ArrayDataset(arrays)


def synthetic_vlmap_desc(cfg: Config, *, size: Optional[int] = None,
                         seed: int = 0) -> ArrayDataset:
    """Synthetic description blank-fill data: the word-level signal of
    :func:`synthetic_vlmap` plus a context sequence whose tokens correlate
    with the positive word (so the description encoder has signal too)."""
    base = synthetic_vlmap(cfg, size=size, seed=seed)
    d = cfg.data
    n = base.size
    rng = np.random.default_rng(seed + 7)
    T = d.max_question_len
    desc = rng.integers(4, d.vocab_size, size=(n, T)).astype(np.int32)
    blank_pos = rng.integers(0, T, size=n).astype(np.int32)
    # Context hint: the token after the blank echoes the positive word
    # (wrapped), a learnable sequential cue.
    word = base.arrays["word"] if "word" in base.arrays else \
        base.arrays["candidates"][np.arange(n), base.arrays["label"]]
    hint_pos = (blank_pos + 1) % T
    desc[np.arange(n), hint_pos] = word
    desc[np.arange(n), blank_pos] = 1  # <unk> blank
    arrays = dict(base.arrays)
    arrays["desc_ids"] = desc
    arrays["blank_pos"] = blank_pos
    return ArrayDataset(arrays)


def synthetic_vqa_joined(cfg: Config, *, n_questions: int = 4096,
                         n_images: int = 512, seed: int = 0,
                         with_scores: bool = False):
    """Deduplicated synthetic corpus in the production layout: a feature
    store of ``n_images`` unique grids (f16, like extraction output) plus a
    question table referencing it by ``image_index`` — the shape the honest
    end-to-end benchmark and the device-resident join run against.

    Returns a :class:`~...features.JoinedDataset`. The learnable signal
    rides on the image's pool5 exactly like :func:`synthetic_vqa`, so the
    training loss is drivable below chance.
    """
    from vqa_transfer_externaldata_tpu.data.features import (
        InMemoryFeatureStore, JoinedDataset)

    d = cfg.data
    # with_scores=False keeps the historical cache key so existing bench
    # corpora (minutes to regenerate on this host) stay valid.
    cache = _synth_cache_path(
        "vqaj", cfg, n_questions, seed,
        extra=f"_m{n_images}" + ("_ws1" if with_scores else ""))
    if os.path.isdir(cache):
        load = lambda name: np.load(os.path.join(cache, name + ".npy"),
                                    mmap_mode="r")
        store = InMemoryFeatureStore(load("grid"), load("pool5"))
        keys = ("q_ids", "image_index", "answer_id") + (
            ("answer_scores",) if with_scores else ())
        rows = {k: load(k) for k in keys}
        return JoinedDataset(rows, store, index_key="image_index",
                             feature_keys=("features", "pool5"))
    rng = np.random.default_rng(seed)
    N = d.grid_h * d.grid_w
    pool5 = rng.standard_normal((n_images, d.pool5_dim), dtype=np.float32)
    # Low-rank grid expansion (see synthetic_vqa): full-size f16 grids
    # without host-RNG-bound generation. Chunked over images so a
    # multi-GB store (the realistic-scale bench, BENCH_STORE_GB) never
    # materializes the full-size float32 intermediate — peak extra host
    # RAM is one ~0.4 GB chunk, not 2x the store.
    rank = 32
    mix = np.random.default_rng(99).standard_normal(
        (rank, d.feature_dim), dtype=np.float32) / np.float32(np.sqrt(rank))
    grid = np.empty((n_images, N, d.feature_dim), np.float16)
    for lo in range(0, n_images, 256):
        hi = min(lo + 256, n_images)
        thin = rng.standard_normal(((hi - lo) * N, rank), dtype=np.float32)
        chunk = (thin @ mix).reshape(hi - lo, N, d.feature_dim)
        chunk += pool5[lo:hi, None, : d.feature_dim]
        grid[lo:hi] = chunk  # extraction stores f16

    q_len = rng.integers(3, d.max_question_len + 1, size=n_questions)
    q_ids = np.zeros((n_questions, d.max_question_len), np.int32)
    for i, L in enumerate(q_len):
        q_ids[i, :L] = rng.integers(4, d.vocab_size, size=L)
    image_index = rng.integers(0, n_images,
                               size=n_questions).astype(np.int32)
    proj = np.random.default_rng(1234).standard_normal(
        (d.pool5_dim, d.num_answers), dtype=np.float32)
    answer = 4 + (np.argmax(pool5[image_index] @ proj, axis=1)
                  % (d.num_answers - 4))
    rows = {"q_ids": q_ids, "image_index": image_index,
            "answer_id": answer.astype(np.int32)}
    if with_scores:
        # One-hot official score vectors (same convention as
        # synthetic_vqa): evaluate_split reports vqa_accuracy from them,
        # so joined and flat val splits carry the same metric set.
        scores = np.zeros((n_questions, d.num_answers), np.float32)
        scores[np.arange(n_questions), answer] = 1.0
        rows["answer_scores"] = scores
    arrays = dict(rows, grid=grid, pool5=pool5)
    if n_questions >= 256:
        tmp = cache + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        for k, v in arrays.items():
            np.save(os.path.join(tmp, f"{k}.npy"), v)
        os.replace(tmp, cache)
    store = InMemoryFeatureStore(grid, pool5)
    return JoinedDataset(rows, store, index_key="image_index",
                         feature_keys=("features", "pool5"))


def synthetic_transfer_corpus(cfg: Config, *, n_vlmap: int = 4096,
                              n_train: int = 4096, n_val: int = 1024,
                              oov_fraction: float = 0.25,
                              noise: float = 0.3, seed: int = 0):
    """Synthetic two-stage corpus for demonstrating the paper's core claim:
    answer-embedding transfer lets the VQA model answer answers it NEVER
    saw as training targets (SURVEY.md section 0; BASELINE north-star).

    Construction: every answer word ``a`` owns a latent concept vector
    ``c_a``. Stage-1 (vlmap) examples cover ALL answer words — the
    "external data" — pairing noisy visual features ``c_a + eps`` with the
    word, so pretraining embeds each word consistently with its visual
    concept. Stage-2 train rows use only the in-vocabulary answer subset;
    the val split draws from ALL answers. A transfer-initialized (and
    frozen) answer table places held-out answers' rows at their pretrained
    word embeddings, so the fusion trained on in-vocab answers scores OOV
    answers by the same visual->word geometry; a scratch-initialized table
    leaves OOV rows random (chance accuracy).

    Requires ``data.feature_dim == data.pool5_dim`` (the two stages share
    the latent concept space). Returns
    ``(vlmap_ds, vqa_train_ds, vqa_val_ds, oov_answer_ids)``.
    """
    d, m = cfg.data, cfg.model
    assert d.feature_dim == d.pool5_dim, (
        "synthetic_transfer_corpus shares one concept space: set "
        f"feature_dim == pool5_dim (got {d.feature_dim} vs {d.pool5_dim})")
    A, D = d.num_answers, d.pool5_dim
    rng = np.random.default_rng(seed)
    answer_ids = np.arange(4, A, dtype=np.int32)  # skip specials
    n_oov = max(1, int(round(answer_ids.size * oov_fraction)))
    oov_ids = np.sort(rng.choice(answer_ids, size=n_oov, replace=False))
    in_ids = np.setdiff1d(answer_ids, oov_ids)

    concept = np.zeros((A, D), np.float32)
    concept[4:] = rng.standard_normal((A - 4, D)).astype(np.float32)
    concept /= np.maximum(
        np.linalg.norm(concept, axis=1, keepdims=True), 1e-6)

    # Stage 1: external data covers every answer word.
    K = m.num_candidates
    w = rng.choice(answer_ids, size=n_vlmap).astype(np.int32)
    feature = (concept[w] + noise * rng.standard_normal(
        (n_vlmap, D)).astype(np.float32))
    task = ((w - 4) % m.num_tasks).astype(np.int32)
    candidates = rng.choice(answer_ids, size=(n_vlmap, K)).astype(np.int32)
    label = rng.integers(0, K, size=n_vlmap).astype(np.int32)
    candidates[np.arange(n_vlmap), label] = w
    vlmap_ds = ArrayDataset({"feature": feature, "task": task,
                             "candidates": candidates, "label": label})

    N = d.grid_h * d.grid_w
    T = d.max_question_len

    def vqa_rows(n: int, ids: np.ndarray) -> ArrayDataset:
        a = rng.choice(ids, size=n).astype(np.int32)
        grid = (concept[a][:, None, :] + noise * rng.standard_normal(
            (n, N, D)).astype(np.float32))
        # Questions are uninformative filler (the image determines the
        # answer) — the point under test is the answer-space geometry.
        q_ids = rng.integers(4, d.vocab_size, size=(n, T)).astype(np.int32)
        scores = np.zeros((n, A), np.float32)
        scores[np.arange(n), a] = 1.0
        return ArrayDataset({"features": grid, "q_ids": q_ids,
                             "answer_id": a, "answer_scores": scores})

    return vlmap_ds, vqa_rows(n_train, in_ids), vqa_rows(n_val, answer_ids), \
        oov_ids


class PrefetchIterator:
    """Background-thread prefetch over a batch iterator (reference C5/C7's
    TF1 queue runners, rebuilt as a bounded queue): the host prepares the
    next ``depth`` batches (feature gathers, HDF5 reads) while the device
    runs the current step, hiding input-pipeline latency."""

    def __init__(self, it: Iterator[Dict[str, np.ndarray]],
                 depth: int = 2) -> None:
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._done = object()
        self._exc: Optional[BaseException] = None

        def worker() -> None:
            try:
                for item in it:
                    self._q.put(item)
            except BaseException as e:  # propagate into the consumer
                self._exc = e
            finally:
                self._q.put(self._done)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self) -> "PrefetchIterator":
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        item = self._q.get()
        if item is self._done:
            if self._exc is not None:
                raise self._exc
            raise StopIteration
        return item


def synthetic_vocabs(cfg: Config):
    """Deterministic word/answer vocabs for synthetic mode: every answer
    token is a word-vocab token, so transfer_init has real rows to map."""
    from vqa_transfer_externaldata_tpu.utils.vocab import SPECIALS, Vocab

    d = cfg.data
    words = SPECIALS + [f"w{i}" for i in range(d.vocab_size - len(SPECIALS))]
    answers = SPECIALS + [f"w{i}"
                          for i in range(d.num_answers - len(SPECIALS))]
    return Vocab.from_tokens(words), Vocab.from_tokens(answers)


# ---------------------------------------------------------------------------
# Loading (real artifacts produced by the data tools, or synthetic fallback)
# ---------------------------------------------------------------------------


def load_dataset(cfg: Config, split: str, stage: str = "vqa",
                 **synth_kw) -> ArrayDataset:
    """Load the preprocessed artifact for ``split`` (reference C5/C7), or the
    synthetic equivalent when ``config.data.synthetic`` is set.

    When ``config.data.feature_path`` points at an extracted feature file
    (cli.extract output), the question/region table is lazily joined against
    it at batch time (features stay deduplicated on disk, reference-style).
    """
    if cfg.data.synthetic:
        seed = {"train": 0, "val": 1, "test": 2}.get(split, 3)
        layout = cfg.data.synthetic_layout
        if layout not in ("flat", "joined"):
            # Validate for EVERY stage, before any work: a typo must not
            # surface only after stage-1 pretraining completes.
            raise ValueError(
                f"data.synthetic_layout={layout!r}: expected 'flat' or "
                "'joined'")
        if stage == "vlmap":
            return synthetic_vlmap(cfg, seed=seed, **synth_kw)
        if stage == "vlmap_desc":
            return synthetic_vlmap_desc(cfg, seed=seed, **synth_kw)
        if layout == "joined":
            # Production layout (deduplicated store + image_index join):
            # what the headline bench and the resident fused/sharded
            # paths run against, reachable from the CLI. Val/test splits
            # carry answer_scores like the flat layout so cli.eval
            # reports the same metric set (incl. vqa_accuracy).
            n_q = synth_kw.pop("size", None) or cfg.data.synthetic_size
            return synthetic_vqa_joined(
                cfg, n_questions=n_q, n_images=max(1, n_q // 8),
                seed=seed, with_scores=(split != "train"), **synth_kw)
        return synthetic_vqa(cfg, seed=seed,
                             with_scores=(split != "train"), **synth_kw)
    path = os.path.join(cfg.data.dataset_dir, f"{stage}_{split}.npz")
    if not os.path.exists(path):
        path_h5 = os.path.join(cfg.data.dataset_dir, f"{stage}_{split}.hdf5")
        if os.path.exists(path_h5):
            path = path_h5
        else:
            raise FileNotFoundError(
                f"no preprocessed {stage}/{split} artifact under "
                f"{cfg.data.dataset_dir}; run the data tools "
                f"(data/vqa_v2.py, data/visualgenome.py) or set "
                f"--data.synthetic true")
    ds = ArrayDataset.load(path)
    # Will a CandidateResampler wrap this dataset below? Decided up
    # front because it gates the eager stored-count materialization.
    task_words = None
    if (stage.startswith("vlmap") and split == "train"
            and cfg.data.resample_negatives):
        import json as _json

        meta_path = os.path.join(cfg.data.dataset_dir, f"{stage}_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                meta = _json.load(fh)
            task_words = meta.get("task_words")
    if (stage.startswith("vlmap") and split == "train"
            and cfg.model.dense_candidate_loss
            and "candidates" in ds.arrays
            and (cfg.train.device_data_cache or task_words is None)):
        # Dense training loss inputs for the consumers of STORED
        # candidate sets: the resident path (uploads ds.arrays once, so
        # stored counts must exist even when a resampler wraps for the
        # streamed case) and the streamed-unresampled path. When the
        # streamed CandidateResampler is the consumer it rebuilds counts
        # per fresh draw — materializing [N, V] here would be pure waste
        # (N*V bytes host-side; prohibitive at multi-million-region N).
        itemsize = 1 if cfg.model.num_candidates < 256 else 2
        gb = ds.size * cfg.data.vocab_size * itemsize / 2 ** 30
        if gb > 16:
            raise ValueError(
                f"model.dense_candidate_loss needs a [N={ds.size}, "
                f"V={cfg.data.vocab_size}] candidate-count array "
                f"({gb:.1f} GB host-side) for stored candidate sets — "
                f"beyond the supported scale. Use the gathered CE "
                f"(drop the flag), or stream with resampled negatives "
                f"(data.resample_negatives + vlmap_meta.json), where "
                f"counts are built per batch instead.")
        ds = ArrayDataset(
            attach_candidate_counts(ds.arrays, cfg.data.vocab_size))
    if (stage == "vqa" and cfg.model.model == "vqa_end2end"
            and cfg.data.image_dir):
        # Raw-image (config 5) inputs: join the question table against the
        # COCO JPEGs by image_index -> image_ids (the per-store-row id list
        # written by the extraction/preprocessing tools as image_ids.npy
        # in dataset_dir). Decode runs in the input pipeline (threads or
        # grain, per data.input_pipeline).
        from vqa_transfer_externaldata_tpu.data.ingest import (
            ImageQuestionDataset, coco_image_path)

        ids_path = os.path.join(cfg.data.dataset_dir, "image_ids.npy")
        if not os.path.exists(ids_path):
            raise FileNotFoundError(
                f"end2end with data.image_dir needs {ids_path} (store-row "
                f"-> COCO image id, written by the extraction tool)")
        image_ids = np.load(ids_path)
        # Official COCO naming embeds the split (COCO_val2014_... for VQA
        # v2 val questions): derive per dataset split unless explicitly
        # overridden — a single fixed split name would point every
        # split's paths at train2014 files.
        coco_split = cfg.data.coco_split or {
            "train": "train2014", "val": "val2014",
            "test": "test2015", "test-dev": "test2015"}.get(split, split)
        paths = [coco_image_path(cfg.data.image_dir, coco_split,
                                 int(i)) for i in image_ids]
        return ImageQuestionDataset(dict(ds.arrays), paths,
                                    image_size=cfg.data.image_size)
    if cfg.data.feature_path:
        from vqa_transfer_externaldata_tpu.data.features import (
            FeatureStore, JoinedDataset)

        store = FeatureStore(cfg.data.feature_path)
        if stage.startswith("vlmap"):
            ds = JoinedDataset(ds.arrays, store, index_key="region_index",
                               feature_keys=("feature",))
        else:
            ds = JoinedDataset(ds.arrays, store, index_key="image_index",
                               feature_keys=("features", "pool5"))
    if task_words is not None:
        from vqa_transfer_externaldata_tpu.data.visualgenome import (
            CandidateResampler)

        ds = CandidateResampler(
            ds, {int(t): ids for t, ids in task_words.items()},
            num_candidates=cfg.model.num_candidates,
            count_vocab_size=(cfg.data.vocab_size
                              if cfg.model.dense_candidate_loss
                              else 0))
    return ds
