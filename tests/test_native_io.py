"""Native C++ IO library: build, gather correctness, raw store roundtrip."""

import numpy as np
import pytest

from vqa_transfer_externaldata_tpu.data import native


def test_native_builds_and_matches_numpy():
    if not native.available():
        pytest.skip("no g++ toolchain for the native IO library")
    rng = np.random.default_rng(0)
    base = rng.normal(size=(50, 7, 33)).astype(np.float16)
    idx = rng.integers(0, 50, size=17).astype(np.int32)
    out = native.gather_f16(base, idx, widen=True)
    np.testing.assert_array_equal(out, base[idx].astype(np.float32))
    out16 = native.gather_f16(base, idx, widen=False)
    np.testing.assert_array_equal(out16, base[idx])

    base32 = rng.normal(size=(50, 64)).astype(np.float32)
    np.testing.assert_array_equal(native.gather_f32(base32, idx),
                                  base32[idx])


def test_f16_special_values():
    if not native.available():
        pytest.skip("no g++ toolchain")
    vals = np.array([[0.0, -0.0, 1.0, -2.5, 65504.0, 6.1e-5, 5.96e-8,
                      np.inf, -np.inf]], np.float16)
    idx = np.zeros(1, np.int32)
    out = native.gather_f16(vals, idx, widen=True)
    np.testing.assert_array_equal(out, vals.astype(np.float32))


def test_prefetch_iterator_preserves_order_and_errors():
    from vqa_transfer_externaldata_tpu.data.datasets import PrefetchIterator

    batches = [{"x": np.full((2,), i)} for i in range(20)]
    out = list(PrefetchIterator(iter(batches), depth=3))
    assert len(out) == 20
    for i, b in enumerate(out):
        np.testing.assert_array_equal(b["x"], np.full((2,), i))

    def boom():
        yield {"x": np.zeros(1)}
        raise RuntimeError("worker failure")

    it = PrefetchIterator(boom(), depth=2)
    next(it)
    with pytest.raises(RuntimeError, match="worker failure"):
        next(it)


def test_raw_store_roundtrip(tmp_path):
    from PIL import Image

    from vqa_transfer_externaldata_tpu.data.features import (
        FeatureStore, extract_features)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    paths, ids = [], [7, 8, 9]
    for i in ids:
        p = str(img_dir / f"img_{i}.jpg")
        Image.fromarray(np.full((24, 24, 3), 20 * i, np.uint8)).save(p)
        paths.append(p)
    out = str(tmp_path / "raw_store")
    extract_features(paths, ids, out, batch_size=2, image_size=64,
                     fmt="raw")
    store = FeatureStore(out)
    assert store.grid.shape == (3, 2, 2, 2048)
    assert store.index_of[8] == 1
    got = store.gather(np.array([2, 0], np.int32))
    assert got["features"].shape == (2, 4, 2048)
    assert got["features"].dtype == np.float32
    # rows must match the mmap contents exactly
    np.testing.assert_array_equal(
        got["features"][0],
        np.asarray(store.grid[2], np.float32).reshape(4, 2048))
    store.close()


def test_native_jpeg_decode_matches_pil(tmp_path):
    """libvqa_jpeg decode == PIL bit-for-bit at native size (same libjpeg
    codec) and within 1-2 LSB after the triangle resize (PIL BILINEAR's
    algorithm, float accumulation vs PIL's 8-bit fixed point)."""
    if not native.jpeg_available():
        pytest.skip("no g++/libjpeg for the native JPEG library")
    from PIL import Image

    rng = np.random.default_rng(1)
    cases = [(96, 96, 96),    # no resize: exact
             (128, 96, 64),   # downscale
             (40, 60, 96)]    # upscale
    for w, h, size in cases:
        p = str(tmp_path / f"img_{w}x{h}_{size}.jpg")
        Image.fromarray(rng.integers(0, 256, size=(h, w, 3))
                        .astype(np.uint8)).save(p, quality=95)
        images, status = native.decode_jpeg_batch([p], size)
        assert status[0] == 0
        with Image.open(p) as im:
            im = im.convert("RGB")
            if im.size != (size, size):
                im = im.resize((size, size), Image.BILINEAR)
            ref = np.asarray(im, np.uint8)
        diff = np.abs(images[0].astype(int) - ref.astype(int))
        if (w, h) == (size, size):
            assert diff.max() == 0, "same-size decode must be bit-exact"
        else:
            assert diff.max() <= 2 and diff.mean() < 0.5, (
                w, h, size, diff.max(), diff.mean())

    # Grayscale JPEGs convert to RGB like PIL's convert("RGB").
    g = str(tmp_path / "gray.jpg")
    Image.fromarray(rng.integers(0, 256, size=(50, 50)).astype(np.uint8),
                    mode="L").save(g, quality=95)
    images, status = native.decode_jpeg_batch([g], 50)
    assert status[0] == 0
    assert (images[0][..., 0] == images[0][..., 1]).all()


def test_native_jpeg_batch_flags_bad_files_and_ingest_falls_back(tmp_path):
    if not native.jpeg_available():
        pytest.skip("no g++/libjpeg for the native JPEG library")
    from PIL import Image

    from vqa_transfer_externaldata_tpu.data.ingest import (
        ImageQuestionDataset)

    rng = np.random.default_rng(2)
    good = str(tmp_path / "good.jpg")
    Image.fromarray(np.full((20, 20, 3), 77, np.uint8)).save(good)
    images, status = native.decode_jpeg_batch(
        [good, str(tmp_path / "missing.jpg")], 16)
    assert status[0] == 0 and status[1] != 0
    assert abs(int(images[0].mean()) - 77) <= 2

    # End-to-end through the ingest dataset (native batch decode path).
    n = 6
    arrays = {
        "q_ids": rng.integers(0, 9, size=(n, 3)).astype(np.int32),
        "answer_id": rng.integers(0, 5, size=n).astype(np.int32),
        "image_index": np.zeros(n, np.int32),
    }
    ds = ImageQuestionDataset(arrays, [good], image_size=16)
    batch = next(ds.batches(4, shuffle=False, epochs=1))
    assert batch["images"].shape == (4, 16, 16, 3)
    assert abs(int(batch["images"].mean()) - 77) <= 2
    ds.close()
