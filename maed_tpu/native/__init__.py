"""ctypes bindings for the native (C++) host data-path kernels.

The library is built on demand (g++, see build.sh); when the toolchain or
binary is unavailable every entry point falls back to the numpy/cv2 path, so
the framework never hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_LIB_PATH = osp.join(_HERE, "libclip_ops.so")
_lib = None


_has_jpeg = False
_has_u8 = False


def _build():
    try:
        subprocess.run(["sh", osp.join(_HERE, "build.sh")], check=True,
                       capture_output=True)
        return True
    except Exception:
        return False


def _bind(lib):
    """Attach signatures. Returns (has_jpeg, has_u8); raises AttributeError
    if even the base symbol is missing (not our library)."""
    lib.clip_crop_normalize.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),  # frames
        ctypes.POINTER(ctypes.c_int),                     # src_hw
        ctypes.c_int,                                     # T
        ctypes.POINTER(ctypes.c_double),                  # inv_trans
        ctypes.c_int, ctypes.c_int,                       # out_h, out_w
        ctypes.POINTER(ctypes.c_float),                   # out
        ctypes.c_int,                                     # n_threads
    ]
    lib.clip_crop_normalize.restype = None
    has_jpeg = False
    try:
        lib.has_jpeg_decode.argtypes = []
        lib.has_jpeg_decode.restype = ctypes.c_int
        lib.clip_decode_crop_normalize.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),  # jpeg buffers
            ctypes.POINTER(ctypes.c_int64),                   # byte lengths
            ctypes.c_int,                                     # T
            ctypes.POINTER(ctypes.c_double),                  # inv_trans
            ctypes.c_int, ctypes.c_int,                       # out_h, out_w
            ctypes.POINTER(ctypes.c_float),                   # out
            ctypes.c_int,                                     # n_threads
        ]
        lib.clip_decode_crop_normalize.restype = ctypes.c_int
        has_jpeg = bool(lib.has_jpeg_decode())
    except AttributeError:
        # stale pre-jpeg build on disk: the crop path still works
        pass
    has_u8 = False
    try:
        lib.clip_crop_u8.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),                  # uint8 out
            ctypes.c_int,
        ]
        lib.clip_crop_u8.restype = None
        lib.clip_decode_crop_u8.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),                  # uint8 out
            ctypes.c_int,
        ]
        lib.clip_decode_crop_u8.restype = ctypes.c_int
        has_u8 = True
    except AttributeError:
        # stale pre-u8 build on disk: the normalize paths still work
        pass
    return has_jpeg, has_u8


def _load():
    global _lib, _has_jpeg, _has_u8
    if _lib is not None:
        return _lib
    if not osp.isfile(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        jpeg, u8 = _bind(lib)
    except (OSError, AttributeError):
        return None
    if not jpeg or not u8:
        # stale binary predating the jpeg/u8 entry points — rebuild once
        # (the sources support them); keep the old lib on any failure
        if _build():
            try:
                fresh = ctypes.CDLL(_LIB_PATH)
                jpeg, u8 = _bind(fresh)
                lib = fresh
            except (OSError, AttributeError):
                pass
    _lib, _has_jpeg, _has_u8 = lib, jpeg, u8
    return lib


def native_available() -> bool:
    return _load() is not None


def has_jpeg_decode() -> bool:
    """True when the native build links libjpeg (threaded decode path)."""
    return _load() is not None and _has_jpeg


def has_u8_crop() -> bool:
    """True when the build exports the uint8-output crop entry points
    (the DEVICE_PREPROC host half)."""
    return _load() is not None and _has_u8


def _inv_affines(trans):
    T = len(trans)
    inv = np.zeros((T, 6), np.float64)
    for i, m in enumerate(np.asarray(trans, np.float64)):
        full = np.vstack([m, [0, 0, 1]])
        inv[i] = np.linalg.inv(full)[:2].ravel()
    return inv


def clip_decode_crop_normalize(jpegs, trans, out_h: int, out_w: int,
                               n_threads: int = 0) -> np.ndarray | None:
    """Threaded JPEG decode + fused affine-crop + ImageNet-normalize.

    jpegs: list of T encoded JPEG byte strings. trans: (T, 2, 3) forward
    affines (cv2.warpAffine convention). Returns (T, out_h, out_w, 3)
    float32, or None when the native decode path is unavailable or any
    frame is corrupt (caller falls back to the cv2 path).
    """
    lib = _load()
    if lib is None or not has_jpeg_decode():
        return None

    T = len(jpegs)
    bufs = [np.frombuffer(j, np.uint8) for j in jpegs]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * T)(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for b in bufs]
    )
    lens = np.array([len(j) for j in jpegs], np.int64)
    inv = _inv_affines(trans)
    out = np.empty((T, out_h, out_w, 3), np.float32)
    rc = lib.clip_decode_crop_normalize(
        ptrs,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        T,
        inv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    return out if rc == 0 else None


def clip_crop_normalize(frames, trans, out_h: int, out_w: int,
                        n_threads: int = 0) -> np.ndarray | None:
    """Fused affine-crop + ImageNet-normalize for a clip.

    frames: list of T HxWx3 uint8 RGB arrays (sizes may differ per frame).
    trans: (T, 2, 3) FORWARD affines (input px -> output px), same convention
    as cv2.warpAffine; inverted here.
    Returns (T, out_h, out_w, 3) float32, or None if the native lib is
    unavailable (caller falls back to cv2).
    """
    lib = _load()
    if lib is None:
        return None

    T = len(frames)
    frames = [np.ascontiguousarray(f, np.uint8) for f in frames]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * T)(
        *[f.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for f in frames]
    )
    src_hw = np.array([[f.shape[0], f.shape[1]] for f in frames], np.int32)
    inv = _inv_affines(trans)
    out = np.empty((T, out_h, out_w, 3), np.float32)
    lib.clip_crop_normalize(
        ptrs,
        src_hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        T,
        inv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    return out


def clip_crop_u8(frames, trans, out_h: int, out_w: int,
                 n_threads: int = 0) -> np.ndarray | None:
    """Threaded affine crop to a uint8 clip (NO normalize — the device
    normalizes in-jit; DATASET.DEVICE_PREPROC). Same contract as
    clip_crop_normalize otherwise. Returns (T, out_h, out_w, 3) uint8, or
    None when unavailable (caller falls back to cv2)."""
    lib = _load()
    if lib is None or not _has_u8:
        return None

    T = len(frames)
    frames = [np.ascontiguousarray(f, np.uint8) for f in frames]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * T)(
        *[f.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for f in frames]
    )
    src_hw = np.array([[f.shape[0], f.shape[1]] for f in frames], np.int32)
    inv = _inv_affines(trans)
    out = np.empty((T, out_h, out_w, 3), np.uint8)
    lib.clip_crop_u8(
        ptrs,
        src_hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        T,
        inv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads,
    )
    return out


def clip_decode_crop_u8(jpegs, trans, out_h: int, out_w: int,
                        n_threads: int = 0) -> np.ndarray | None:
    """Threaded JPEG decode + affine crop to a uint8 clip (device-normalize
    mode). Returns (T, out_h, out_w, 3) uint8, or None when the native
    decode/u8 path is unavailable or any frame is corrupt."""
    lib = _load()
    if lib is None or not has_jpeg_decode() or not _has_u8:
        return None

    T = len(jpegs)
    bufs = [np.frombuffer(j, np.uint8) for j in jpegs]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * T)(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for b in bufs]
    )
    lens = np.array([len(j) for j in jpegs], np.int64)
    inv = _inv_affines(trans)
    out = np.empty((T, out_h, out_w, 3), np.uint8)
    rc = lib.clip_decode_crop_u8(
        ptrs,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        T,
        inv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads,
    )
    return out if rc == 0 else None
