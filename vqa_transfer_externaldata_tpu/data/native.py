"""ctypes bindings + on-demand build of the native IO library
(vqa_transfer_externaldata_tpu/native/io_kernels.cc).

The library is compiled once per machine into the package's ``_build/``
directory with the system ``g++`` (no pybind11 — plain C ABI). Every entry
point has a pure-numpy fallback, so the framework runs (slower) where no
compiler exists; ``available()`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from vqa_transfer_externaldata_tpu.utils.logging import log

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "io_kernels.cc")
_BUILD_DIR = os.path.join(os.path.dirname(_SRC), "_build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libvqa_io.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-pthread",
           "-std=c++17", _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except (OSError, subprocess.SubprocessError) as e:
        log.warning("native IO build failed (%s); using numpy fallback", e)
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _LIB_PATH
        try:  # a missing source with a prebuilt lib is fine — just load
            stale = (not os.path.exists(path)
                     or os.path.getmtime(path) < os.path.getmtime(_SRC))
        except OSError:
            stale = not os.path.exists(path)
        if stale:
            path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            assert lib.vqa_io_abi_version() == 1
            i64, i32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)
            u16p = ctypes.POINTER(ctypes.c_uint16)
            f32p = ctypes.POINTER(ctypes.c_float)
            lib.gather_rows_f16.argtypes = [u16p, i64, i32p, i64, u16p,
                                            ctypes.c_int]
            lib.gather_rows_f16_to_f32.argtypes = [u16p, i64, i32p, i64,
                                                   f32p, ctypes.c_int]
            lib.gather_rows_f32.argtypes = [f32p, i64, i32p, i64, f32p,
                                            ctypes.c_int]
            _lib = lib
        except OSError as e:
            log.warning("native IO load failed (%s); numpy fallback", e)
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _threads() -> int:
    return min(8, os.cpu_count() or 1)


def gather_f16(base: np.ndarray, idx: np.ndarray,
               widen: bool = True) -> np.ndarray:
    """Gather rows from a 2D-viewable f16 array; optional f32 widen.

    ``base``: [M, ...] float16 (C-contiguous, e.g. a np.memmap);
    ``idx``: [n] int32. Returns [n, ...] float32 (widen) or float16.
    """
    row_shape = base.shape[1:]
    row_elems = int(np.prod(row_shape))
    idx = np.ascontiguousarray(idx, np.int32)
    lib = _load()
    if lib is None:
        out = base[idx]
        return out.astype(np.float32) if widen else out
    n = idx.shape[0]
    flat = base.reshape(base.shape[0], row_elems)
    assert flat.dtype == np.float16 and flat.flags.c_contiguous
    u16p = ctypes.POINTER(ctypes.c_uint16)
    i32p = ctypes.POINTER(ctypes.c_int32)
    if widen:
        out = np.empty((n, row_elems), np.float32)
        lib.gather_rows_f16_to_f32(
            flat.ctypes.data_as(u16p), row_elems,
            idx.ctypes.data_as(i32p), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), _threads())
    else:
        out = np.empty((n, row_elems), np.float16)
        lib.gather_rows_f16(
            flat.ctypes.data_as(u16p), row_elems,
            idx.ctypes.data_as(i32p), n,
            out.ctypes.data_as(u16p), _threads())
    return out.reshape((n,) + row_shape)


def gather_f32(base: np.ndarray, idx: np.ndarray) -> np.ndarray:
    row_shape = base.shape[1:]
    row_elems = int(np.prod(row_shape))
    idx = np.ascontiguousarray(idx, np.int32)
    lib = _load()
    if lib is None:
        return np.ascontiguousarray(base[idx])
    flat = base.reshape(base.shape[0], row_elems)
    assert flat.dtype == np.float32 and flat.flags.c_contiguous
    f32p = ctypes.POINTER(ctypes.c_float)
    out = np.empty((idx.shape[0], row_elems), np.float32)
    lib.gather_rows_f32(flat.ctypes.data_as(f32p), row_elems,
                        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                        idx.shape[0], out.ctypes.data_as(f32p), _threads())
    return out.reshape((idx.shape[0],) + row_shape)


# ---------------------------------------------------------------------------
# JPEG decode (libvqa_jpeg.so — separate object: needs -ljpeg, and the
# dependency-free gather library must keep working where libjpeg is absent)
# ---------------------------------------------------------------------------

_JPEG_SRC = os.path.join(os.path.dirname(_SRC), "jpeg_decode.cc")
_JPEG_LIB_PATH = os.path.join(_BUILD_DIR, "libvqa_jpeg.so")

_jpeg_lib: Optional[ctypes.CDLL] = None
_jpeg_tried = False


def _load_jpeg() -> Optional[ctypes.CDLL]:
    global _jpeg_lib, _jpeg_tried
    with _lock:
        if _jpeg_tried:
            return _jpeg_lib
        _jpeg_tried = True
        path = _JPEG_LIB_PATH
        try:  # a missing source with a prebuilt lib is fine — just load
            stale = (not os.path.exists(path)
                     or os.path.getmtime(path) < os.path.getmtime(_JPEG_SRC))
        except OSError:
            stale = not os.path.exists(path)
        if stale:
            os.makedirs(_BUILD_DIR, exist_ok=True)
            cmd = ["g++", "-O3", "-march=native", "-fPIC", "-shared",
                   "-pthread", "-std=c++17", _JPEG_SRC, "-ljpeg",
                   "-o", _JPEG_LIB_PATH]
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
            except (OSError, subprocess.SubprocessError) as e:
                log.warning("native JPEG build failed (%s); PIL decode "
                            "fallback", e)
                return None
        try:
            lib = ctypes.CDLL(path)
            assert lib.vqa_jpeg_abi_version() == 1
            lib.decode_jpeg_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
            _jpeg_lib = lib
        except OSError as e:
            log.warning("native JPEG load failed (%s); PIL fallback", e)
            _jpeg_lib = None
        return _jpeg_lib


def jpeg_available() -> bool:
    return _load_jpeg() is not None


def decode_jpeg_batch(paths, size: int, threads: Optional[int] = None):
    """Decode + resize a batch of JPEG files to [n, size, size, 3] uint8
    RGB with parallel C++ threads (the GIL is released for the whole
    call). ``threads`` pins the worker count (default: one per core, max
    16) — the decode-scaling benchmark uses it to measure the per-core
    rate directly. Returns ``(images, status)`` where ``status[i] != 0``
    marks a file the caller must decode itself (missing/corrupt/CMYK), or
    ``None`` when the native library is unavailable."""
    lib = _load_jpeg()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, size, size, 3), np.uint8)
    status = np.empty(n, np.int32)
    c_paths = (ctypes.c_char_p * n)(
        *[os.fsencode(p) for p in paths])
    lib.decode_jpeg_batch(
        c_paths, n, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        threads if threads else min(16, os.cpu_count() or 1))
    return out, status
