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


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not osp.isfile(_LIB_PATH):
        try:
            subprocess.run(["sh", osp.join(_HERE, "build.sh")], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
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
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


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

    inv = np.zeros((T, 6), np.float64)
    for i, m in enumerate(np.asarray(trans, np.float64)):
        full = np.vstack([m, [0, 0, 1]])
        iv = np.linalg.inv(full)
        inv[i] = iv[:2].ravel()

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
