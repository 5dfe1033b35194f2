"""Image-feature extraction + feature store (reference C4: offline
ResNet-101 over COCO/VG JPEGs -> HDF5 of 14x14x2048 grids + pool5 —
SURVEY.md section 3.4).

The extractor is a jit-compiled ResNet forward (bf16, on-TPU resize +
normalize); JPEG decode and region cropping stay on host (PIL). Grids are
stored float16 — they are consumed in bfloat16, so storage at half width
halves the read bandwidth of the whole training pipeline.

``FeatureStore`` serves gathered rows at batch time; ``JoinedDataset``
wraps the question-level arrays (which carry ``image_index``/
``region_index``) and materializes the ``features``/``pool5``/``feature``
batch keys on the fly, so question tables and image features stay
deduplicated on disk exactly like the reference's per-image HDF5 layout.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

from vqa_transfer_externaldata_tpu.data.datasets import ArrayDataset
from vqa_transfer_externaldata_tpu.utils.logging import log


class FeatureStore:
    """Random-access [M, ...] feature arrays.

    Backends: ``.hdf5``/``.h5`` file, ``.npz`` file, or a *raw* directory
    (``meta.json`` + ``grid.f16.bin`` + ``pool5.f32.bin`` + ``image_ids.npy``)
    written by ``extract_features(fmt="raw")`` — memory-mapped and gathered
    by the multi-threaded native IO library (data/native.py) when built.
    """

    def __init__(self, path: str) -> None:
        self.path = path
        self._file = None
        self._raw = False
        if os.path.isdir(path):
            import json

            with open(os.path.join(path, "meta.json")) as fh:
                meta = json.load(fh)
            gshape = tuple(meta["grid_shape"])  # [M, g, g, C]
            self.grid = np.memmap(os.path.join(path, "grid.f16.bin"),
                                  dtype=np.float16, mode="r", shape=gshape)
            self.pool5 = np.memmap(
                os.path.join(path, "pool5.f32.bin"), dtype=np.float32,
                mode="r", shape=(gshape[0], meta["pool5_dim"]))
            self.image_ids = np.load(os.path.join(path, "image_ids.npy"))
            self._raw = True
        elif path.endswith((".h5", ".hdf5")):
            import h5py

            self._file = h5py.File(path, "r")
            self.grid = self._file["grid"]
            self.pool5 = self._file["pool5"]
            self.image_ids = np.asarray(self._file["image_ids"])
        else:
            data = np.load(path)
            self.grid = data["grid"]
            self.pool5 = data["pool5"]
            self.image_ids = data["image_ids"]
        self.index_of = {int(i): k for k, i in enumerate(self.image_ids)}

    def gather(self, indices: np.ndarray, *, flatten_grid: bool = True
               ) -> Dict[str, np.ndarray]:
        if self._raw:
            from vqa_transfer_externaldata_tpu.data import native

            grid = native.gather_f16(self.grid, indices, widen=True)
            pool5 = native.gather_f32(self.pool5, indices)
        elif self._file is not None:
            # h5py fancy indexing requires sorted unique indices.
            uniq, inverse = np.unique(indices, return_inverse=True)
            grid = np.asarray(self.grid[uniq])[inverse].astype(np.float32)
            pool5 = np.asarray(self.pool5[uniq])[inverse]
        else:
            grid = self.grid[indices].astype(np.float32)
            pool5 = self.pool5[indices]
        if flatten_grid and grid.ndim == 4:
            b, h, w, c = grid.shape
            grid = grid.reshape(b, h * w, c)
        return {"features": grid, "pool5": pool5.astype(np.float32)}

    def close(self) -> None:
        if self._file is not None:
            self._file.close()


class InMemoryFeatureStore(FeatureStore):
    """FeatureStore over arrays already in memory (synthetic corpora,
    tests, benchmarks) — same gather contract, no file backend."""

    def __init__(self, grid: np.ndarray, pool5: np.ndarray,
                 image_ids: Optional[np.ndarray] = None) -> None:
        self.path = "<memory>"
        self._file = None
        self._raw = False
        self.grid = grid
        self.pool5 = pool5
        self.image_ids = (image_ids if image_ids is not None
                          else np.arange(grid.shape[0], dtype=np.int64))
        self.index_of = {int(i): k for k, i in enumerate(self.image_ids)}


class JoinedDataset(ArrayDataset):
    """Question/region table + lazy feature join (reference C5/C7 pattern)."""

    def __init__(self, arrays: Dict[str, np.ndarray], store: FeatureStore,
                 index_key: str = "image_index",
                 feature_keys: Sequence[str] = ("features", "pool5")) -> None:
        super().__init__(arrays)
        self.store = store
        self.index_key = index_key
        self.feature_keys = tuple(feature_keys)

    def take(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        """Row slice + feature join — every batch path (training batches,
        the evaler's padded epoch, serving) materializes rows through here,
        so feature-store-backed runs always carry ``features``/``pool5``/
        ``feature`` keys."""
        batch = super().take(idx)
        feats = self.store.gather(batch[self.index_key])
        for key in self.feature_keys:
            if key == "feature":  # vlmap: region pool5 vector
                batch["feature"] = feats["pool5"]
            else:
                batch[key] = feats[key]
        return batch


# ---------------------------------------------------------------------------
# Extraction driver
# ---------------------------------------------------------------------------


def _load_image(path: str, box: Optional[Sequence[int]] = None) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        if box is not None:
            x, y, w, h = box
            im = im.crop((x, y, x + max(1, w), y + max(1, h)))
        return np.asarray(im, np.uint8)


def extract_features(
    image_paths: Sequence[str],
    image_ids: Sequence[int],
    out_path: str,
    *,
    boxes: Optional[Sequence[Optional[Sequence[int]]]] = None,
    batch_size: int = 32,
    image_size: int = 448,
    variables=None,
    dtype: str = "bfloat16",
    fmt: str = "hdf5",  # "hdf5" | "raw" (mmap dir + native gather)
    stem: str = "space_to_depth",  # 2.5x faster stem (ops/resnet.py)
) -> str:
    """Run the (jit) ResNet-101 extractor over images/crops -> feature file.

    ``variables``: ResNet flax variables ({"params", "batch_stats"}); random
    init when omitted (useful only for pipeline tests — real runs should
    convert a pretrained torchvision/slim checkpoint via
    ops.resnet.convert_torch_state_dict).
    """
    import jax
    import jax.numpy as jnp

    from vqa_transfer_externaldata_tpu.ops.layers import dtype_of
    from vqa_transfer_externaldata_tpu.ops.resnet import (
        ResNetV1, preprocess_images)

    model = ResNetV1(dtype=dtype_of(dtype), stem=stem)
    if variables is None:
        log.warning("extract_features: RANDOM ResNet weights (tests only)")
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, image_size, image_size, 3), jnp.float32),
            train=False)

    @jax.jit
    def forward(images_u8):
        out = model.apply(variables, preprocess_images(images_u8,
                                                       image_size),
                          train=False)
        return out["grid"].astype(jnp.float16), out["pool5"]

    n = len(image_paths)
    boxes = boxes if boxes is not None else [None] * n
    g = image_size // 32

    if fmt == "raw":
        import json

        os.makedirs(out_path, exist_ok=True)
        d_grid = np.memmap(os.path.join(out_path, "grid.f16.bin"),
                           dtype=np.float16, mode="w+",
                           shape=(n, g, g, 2048))
        d_pool = np.memmap(os.path.join(out_path, "pool5.f32.bin"),
                           dtype=np.float32, mode="w+", shape=(n, 2048))
        np.save(os.path.join(out_path, "image_ids.npy"),
                np.asarray(image_ids, np.int64))
        with open(os.path.join(out_path, "meta.json"), "w") as fh:
            json.dump({"grid_shape": [n, g, g, 2048], "pool5_dim": 2048},
                      fh)
        closer = lambda: (d_grid.flush(), d_pool.flush())
    else:
        import h5py

        os.makedirs(os.path.dirname(os.path.abspath(out_path)),
                    exist_ok=True)
        f = h5py.File(out_path, "w")
        d_grid = f.create_dataset("grid", (n, g, g, 2048), dtype="f2",
                                  chunks=(1, g, g, 2048))
        d_pool = f.create_dataset("pool5", (n, 2048), dtype="f4")
        f.create_dataset("image_ids", data=np.asarray(image_ids, np.int64))
        closer = f.close

    for start in range(0, n, batch_size):
        idx = range(start, min(start + batch_size, n))
        imgs = np.stack([
            _resize_host(_load_image(image_paths[i], boxes[i]),
                         image_size) for i in idx])
        pad = batch_size - imgs.shape[0]
        if pad:  # static shapes for jit
            imgs = np.concatenate([imgs, np.repeat(imgs[:1], pad, 0)])
        grid, pool5 = forward(jnp.asarray(imgs))
        grid = np.asarray(jax.device_get(grid))[:len(idx)]
        pool5 = np.asarray(jax.device_get(pool5))[:len(idx)]
        d_grid[idx.start:idx.stop] = grid
        d_pool[idx.start:idx.stop] = pool5
        if (start // batch_size) % 50 == 0:
            log.info("extracted %d/%d", idx.stop, n)
    closer()
    log.info("features written to %s", out_path)
    return out_path


def _resize_host(img: np.ndarray, size: int) -> np.ndarray:
    """Host-side resize to the static extractor input size (PIL bilinear)."""
    from PIL import Image

    if img.shape[0] == size and img.shape[1] == size:
        return img
    return np.asarray(
        Image.fromarray(img).resize((size, size), Image.BILINEAR), np.uint8)
