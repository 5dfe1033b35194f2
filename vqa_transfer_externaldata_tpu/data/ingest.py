"""Raw-image ingest pipeline for the end-to-end model (BASELINE config 5):
COCO JPEGs + preprocessed question tables -> uint8 image batches, decoded
on host worker threads, resized to the static extractor input, and consumed
by the jit-compiled normalize+ResNet+VQA program (models/end2end.py).

This replaces the reference's offline feature-extraction stage (SURVEY.md
section 3.4): no HDF5 grid intermediates; JPEG decode is the only host
work and it overlaps the device step via the trainer's PrefetchIterator.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Sequence

import numpy as np

from vqa_transfer_externaldata_tpu.data.datasets import ArrayDataset


def _decode_pil(path: str, size: int) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        if im.size != (size, size):
            im = im.resize((size, size), Image.BILINEAR)
        return np.asarray(im, np.uint8)


def _decode(path: str, size: int) -> np.ndarray:
    """One JPEG -> [size, size, 3] uint8. Native (libjpeg + triangle
    resize, <=1 LSB vs PIL — native/jpeg_decode.cc) when built; PIL
    otherwise, and for anything the native decoder rejects."""
    from vqa_transfer_externaldata_tpu.data import native

    decoded = native.decode_jpeg_batch([path], size)
    if decoded is not None:
        images, status = decoded
        if status[0] == 0:
            return images[0]
    return _decode_pil(path, size)


class ImageQuestionDataset(ArrayDataset):
    """Question table + on-the-fly JPEG decode (keyed by ``image_index``).

    ``image_paths``: row i is the JPEG for feature-store index i (the same
    indexing the preprocessing pipeline writes into ``image_index``).
    """

    def __init__(self, arrays: Dict[str, np.ndarray],
                 image_paths: Sequence[str], *, image_size: int = 448,
                 decode_workers: int = 8) -> None:
        super().__init__(arrays)
        self.image_paths = list(image_paths)
        self.image_size = image_size
        self._pool = ThreadPoolExecutor(max_workers=decode_workers)

    def batches(self, batch_size: int, **kw) -> Iterator[Dict[str, np.ndarray]]:
        size = self.image_size
        for batch in super().batches(batch_size, **kw):
            paths = [self.image_paths[i] for i in batch["image_index"]]
            batch["images"] = self._decode_batch(paths, size)
            yield batch

    def _decode_batch(self, paths, size: int) -> np.ndarray:
        # Native path: libjpeg decode + PIL-equivalent triangle resize in
        # parallel C++ threads (<=1 LSB vs PIL, tested; the GIL is
        # released for the whole batch). Per-image fallback to PIL for
        # anything the native decoder rejects (missing file, CMYK, ...).
        from vqa_transfer_externaldata_tpu.data import native

        decoded = native.decode_jpeg_batch(paths, size)
        if decoded is None:  # no compiler / no libjpeg: thread-pool PIL
            images = list(self._pool.map(lambda p: _decode(p, size), paths))
            return np.stack(images)
        images, status = decoded
        for i in np.nonzero(status)[0]:
            # straight to PIL: the native decoder just rejected this file
            images[i] = _decode_pil(paths[int(i)], size)
        return images

    def close(self) -> None:
        self._pool.shutdown(wait=False)


def coco_image_path(image_dir: str, split: str, image_id: int) -> str:
    """Official COCO-2014 naming: COCO_<split>_<id:012d>.jpg."""
    return os.path.join(image_dir, f"COCO_{split}_{image_id:012d}.jpg")


def build_image_question_dataset(
    question_npz: str, image_dir: str, coco_split: str,
    image_ids: Sequence[int], *, image_size: int = 448,
    decode_workers: int = 8) -> ImageQuestionDataset:
    """Assemble the config-5 training dataset: preprocessed question table
    (data/vqa_v2.py output, whose ``image_index`` indexes ``image_ids``)
    joined with the raw COCO JPEGs."""
    with np.load(question_npz) as f:
        arrays = {k: f[k] for k in f.files}
    paths = [coco_image_path(image_dir, coco_split, i) for i in image_ids]
    return ImageQuestionDataset(arrays, paths, image_size=image_size,
                                decode_workers=decode_workers)
