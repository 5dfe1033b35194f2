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
