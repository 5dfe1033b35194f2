"""Grain-based input pipeline (SURVEY.md section 7 step 7: "Grain JPEG
pipeline feeding a jit-compiled resize/normalize").

Grain provides deterministic, checkpointable, multi-worker data loading —
the production-grade counterpart of the in-repo thread-pool pipeline
(data/ingest.py). The same question tables and JPEG joins are exposed as a
``grain.MapDataset`` so users scale decode across processes with
``grain.DataLoader`` while keeping bit-reproducible epoch order.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

import grain

from vqa_transfer_externaldata_tpu.data.ingest import _decode


class _QuestionImageSource:
    """Random-access grain source over (question row, JPEG path)."""

    def __init__(self, arrays: Dict[str, np.ndarray],
                 image_paths: Sequence[str], image_size: int) -> None:
        self.arrays = arrays
        self.image_paths = list(image_paths)
        self.image_size = image_size
        self._n = next(iter(arrays.values())).shape[0]

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        row = {k: v[i] for k, v in self.arrays.items()}
        row["images"] = _decode(
            self.image_paths[int(row["image_index"])], self.image_size)
        return row


def make_grain_dataset(arrays: Dict[str, np.ndarray],
                       image_paths: Sequence[str], *,
                       image_size: int = 448,
                       batch_size: int = 256,
                       seed: int = 0,
                       shuffle: bool = True,
                       num_epochs: Optional[int] = None):
    """grain.MapDataset: shuffle -> decode -> fixed-shape batches.

    Iterate directly (in-process) or wrap with ``grain.DataLoader`` /
    ``to_iter_dataset(...)`` + ``mp_prefetch`` for multi-worker decode.
    """
    source = _QuestionImageSource(arrays, image_paths, image_size)
    ds = grain.MapDataset.source(source)
    if shuffle:
        ds = ds.shuffle(seed=seed)
    if num_epochs is not None and num_epochs > 1:
        ds = ds.repeat(num_epochs)
    ds = ds.batch(batch_size, drop_remainder=True)
    return ds


class _ArraySource:
    """Random-access grain source over a plain row table (no decode)."""

    def __init__(self, arrays: Dict[str, np.ndarray]) -> None:
        self.arrays = arrays
        self._n = next(iter(arrays.values())).shape[0]

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        return {k: v[i] for k, v in self.arrays.items()}


class _JoinedRowSource:
    """Random-access grain source over a feature-store-backed dataset
    (data/features.JoinedDataset): every row materializes through the
    dataset's own ``take()`` so the feature join (``features``/``pool5``/
    ``feature`` keys) happens per sample, exactly as the thread-pool
    pipeline's batches do. With ``workers > 0`` the store must be
    picklable (npz/raw-mmap stores are; an open-HDF5 store is not —
    use workers=0 there)."""

    def __init__(self, dataset) -> None:
        self.dataset = dataset
        self._n = len(dataset)

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        row = self.dataset.take(np.array([int(i)]))
        return {k: v[0] for k, v in row.items()}


class GrainTrainIterator:
    """Checkpointable infinite train iterator (``--data.input_pipeline
    grain``): source -> per-epoch shuffle -> repeat -> batch, backed by
    grain's deterministic index iterator. ``get_state()`` returns a
    JSON-serializable dict that the Trainer persists next to each Orbax
    checkpoint (utils/checkpoint.CheckpointManager.save_data_iter), so a
    resumed run continues on the EXACT next sample — the reference had no
    such capability (a restart replays data, SURVEY.md section 5
    failure-detection row).

    ``workers > 0`` moves decode into that many grain worker processes
    (``mp_prefetch``); the iterator state protocol is identical.
    """

    def __init__(self, dataset, *, batch_size: int, seed: int,
                 workers: int = 0, shard=(0, 1)) -> None:
        if hasattr(dataset, "image_paths"):  # raw-JPEG (end2end) source
            source = _QuestionImageSource(
                {k: np.asarray(v) for k, v in dataset.arrays.items()},
                dataset.image_paths, dataset.image_size)
        elif hasattr(dataset, "store"):  # feature-store join (C5/C7)
            source = _JoinedRowSource(dataset)
        else:
            source = _ArraySource(
                {k: np.asarray(v) for k, v in dataset.arrays.items()})
        pi, pc = shard
        if batch_size % pc:
            raise ValueError(f"global batch {batch_size} not divisible by "
                             f"process count {pc}")
        ds = grain.MapDataset.source(source).shuffle(seed=seed)
        if pc > 1:
            # Multi-host data parallelism: every process shuffles the SAME
            # identically-seeded epoch permutation, trims it to a multiple
            # of pc (unequal slice lengths would drift grain's
            # parent-epoch computation across processes — the same sample
            # could then appear on two processes in one global batch),
            # and takes a disjoint stride — matching the streaming path's
            # shard=(pi, pc). Each process batches its local
            # batch_size/pc rows; the Trainer assembles the global array
            # (make_array_from_process_local_data). All processes consume
            # the same number of elements per step, so the (process-0)
            # checkpointed iterator state is position-correct for every
            # process's sliced view.
            usable = (len(source) // pc) * pc
            ds = ds[:usable][pi::pc]
        ds = (ds.repeat(None)  # infinite: the trainer bounds by max_steps
              .batch(batch_size // pc, drop_remainder=True))
        it_ds = ds.to_iter_dataset()
        if workers > 0:
            it_ds = it_ds.mp_prefetch(
                grain.MultiprocessingOptions(num_workers=workers))
        self._it = iter(it_ds)

    def __iter__(self) -> "GrainTrainIterator":
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        return {k: np.asarray(v) for k, v in next(self._it).items()}

    def get_state(self) -> dict:
        return self._it.get_state()

    def set_state(self, state: dict) -> None:
        self._it.set_state(state)
