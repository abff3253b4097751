"""ctypes bindings for the native C++ staging library.

Builds ``tubedetr_tpu/native/staging.cc`` on first use (g++ -O3 -march=native
shared object cached next to the source) and exposes:

* ``stage_clip(frames_u8, pad_h, pad_w)`` -> padded normalized float32 clip
* ``gather_strided(clip_f32, stride)`` -> contiguous slow stream

Falls back to numpy when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from tubedetr_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "build", "libstaging.so"))
_SRC_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "staging.cc"))

_lib = None
_pool = None
_lock = threading.Lock()


def _build() -> Optional[str]:
    if os.path.exists(_SO_PATH) and os.path.getmtime(_SO_PATH) >= os.path.getmtime(
        _SRC_PATH
    ):
        return _SO_PATH
    os.makedirs(os.path.dirname(_SO_PATH), exist_ok=True)
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-shared",
                "-fPIC",
                "-std=c++17",
                "-pthread",
                _SRC_PATH,
                "-o",
                _SO_PATH,
            ],
            check=True,
            capture_output=True,
        )
        return _SO_PATH
    except Exception:
        return None


def get_lib(n_threads: int = 0):
    """Load (building if needed) the staging library + worker pool.
    Returns None when native staging is unavailable."""
    global _lib, _pool
    with _lock:
        if _lib is not None:
            return _lib
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.staging_pool_create.restype = ctypes.c_void_p
        lib.staging_pool_create.argtypes = [ctypes.c_int]
        lib.staging_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.stage_clip.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.gather_strided.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.resize_normalize_clip.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        if n_threads <= 0:
            n_threads = max(1, (os.cpu_count() or 1))
        _pool = lib.staging_pool_create(n_threads)
        _lib = lib
        return _lib


def stage_clip(frames_u8: np.ndarray, pad_h: int, pad_w: int) -> np.ndarray:
    """(t, h, w, 3) uint8 -> (t, pad_h, pad_w, 3) float32 normalized; native
    path with numpy fallback."""
    t, h, w, _ = frames_u8.shape
    lib = get_lib()
    if lib is None:
        out = np.zeros((t, pad_h, pad_w, 3), np.float32)
        x = frames_u8.astype(np.float32) / 255.0
        out[:, :h, :w] = (x - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
        return out
    frames_u8 = np.ascontiguousarray(frames_u8)
    out = np.empty((t, pad_h, pad_w, 3), np.float32)
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    lib.stage_clip(
        _pool,
        frames_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t,
        h,
        w,
        pad_h,
        pad_w,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def _csr(mat: np.ndarray):
    """Dense interpolation matrix -> (indptr, indices, data) CSR arrays."""
    nz_rows, nz_cols = np.nonzero(mat)
    indptr = np.zeros(mat.shape[0] + 1, np.int32)
    np.add.at(indptr, nz_rows + 1, 1)
    indptr = np.cumsum(indptr, dtype=np.int32)
    return (
        np.ascontiguousarray(indptr),
        np.ascontiguousarray(nz_cols.astype(np.int32)),
        np.ascontiguousarray(mat[nz_rows, nz_cols].astype(np.float32)),
    )


def resize_normalize_clip(
    frames_u8: np.ndarray,
    ah: np.ndarray,
    aw: np.ndarray,
    normalize: bool = True,
) -> np.ndarray:
    """Host-side fused [crop->]resize -> /255 [-> ImageNet normalize].

    (t, h, w, 3) uint8 -> (out_h, out_w) float32 via the composed sparse
    interpolation operators of ``tubedetr_tpu/data/transforms.py``. Runs in
    the native thread pool (numpy-einsum fallback) so data workers never
    dispatch device work (SURVEY.md §7 hard part 3); the device Pallas/einsum
    path in ``ops/preprocess.py`` stays for serving, where preprocessing runs
    inside the model program.
    """
    t, h, w, _ = frames_u8.shape
    out_h, out_w = ah.shape[0], aw.shape[0]
    lib = get_lib()
    if lib is None:
        x = np.einsum(
            "oh,nhwc,pw->nopc",
            ah.astype(np.float32),
            frames_u8.astype(np.float32) / 255.0,
            aw.astype(np.float32),
            optimize=True,
        )
        if normalize:
            x = (x - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
                IMAGENET_STD, np.float32
            )
        return x.astype(np.float32)
    frames_u8 = np.ascontiguousarray(frames_u8)
    ah_indptr, ah_idx, ah_val = _csr(np.asarray(ah))
    aw_indptr, aw_idx, aw_val = _csr(np.asarray(aw))
    out = np.empty((t, out_h, out_w, 3), np.float32)
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.resize_normalize_clip(
        _pool,
        frames_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(f32p),
        t,
        h,
        w,
        out_h,
        out_w,
        ah_indptr.ctypes.data_as(i32p),
        ah_idx.ctypes.data_as(i32p),
        ah_val.ctypes.data_as(f32p),
        aw_indptr.ctypes.data_as(i32p),
        aw_idx.ctypes.data_as(i32p),
        aw_val.ctypes.data_as(f32p),
        mean.ctypes.data_as(f32p),
        std.ctypes.data_as(f32p),
        1 if normalize else 0,
    )
    return out


def gather_strided(clip_f32: np.ndarray, stride: int) -> np.ndarray:
    """(t, H, W, 3) float32 -> (ceil(t/k), H, W, 3) contiguous slow stream."""
    t = clip_f32.shape[0]
    n = -(-t // stride)
    lib = get_lib()
    if lib is None:
        return np.ascontiguousarray(clip_f32[::stride])
    clip_f32 = np.ascontiguousarray(clip_f32)
    frame_elems = int(np.prod(clip_f32.shape[1:]))
    out = np.empty((n,) + clip_f32.shape[1:], np.float32)
    lib.gather_strided(
        _pool,
        clip_f32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t,
        stride,
        frame_elems,
    )
    return out
