"""Native host-side runtime: the C++ slicecache volume server.

Provides LRU-cached NIfTI volume decoding and slice extraction through a
C ABI (slicecache.cpp), consumed via ctypes. Auto-builds with `make` on
first use (g++ + zlib, both in the image); falls back to the pure-numpy
reader in ddgan_tpu.data.nifti when unavailable.

This is the TPU framework's native analog of the reference's native layer
(score_sde/op CUDA kernels → XLA/Pallas on-device; this serves the
host-side IO path, the actual bottleneck in the LUNA16 pipeline where the
reference re-decodes a whole 256^3 .nii.gz per __getitem__,
datasets_prep/custom.py:190).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libslicecache.so"
_lib = None
_build_attempted = False


def _load() -> ctypes.CDLL | None:
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(
                ["make", "-C", str(_HERE)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.slicecache_volume_dims.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)
    ]
    lib.slicecache_volume_dims.restype = ctypes.c_int
    lib.slicecache_read_slice_u8.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.slicecache_read_slice_u8.restype = ctypes.c_int
    lib.slicecache_mask_bbox.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.slicecache_mask_bbox.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def volume_dims(path: str) -> tuple[int, int, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("slicecache native library unavailable")
    dims = (ctypes.c_int64 * 3)()
    rc = lib.slicecache_volume_dims(str(path).encode(), dims)
    if rc != 0:
        raise IOError(f"slicecache: failed to read {path} (rc={rc})")
    return int(dims[0]), int(dims[1]), int(dims[2])


def read_slice_u8(path: str, axis: str | int, index: int) -> np.ndarray:
    """uint8 2-D slice along 'x'/'y'/'z' with reference cast semantics."""
    lib = _load()
    if lib is None:
        raise RuntimeError("slicecache native library unavailable")
    ax = "xyz".index(axis) if isinstance(axis, str) else int(axis)
    nx, ny, nz = volume_dims(path)
    shapes = {0: (ny, nz), 1: (nx, nz), 2: (nx, ny)}
    out = np.empty(shapes[ax], dtype=np.uint8)
    rc = lib.slicecache_read_slice_u8(
        str(path).encode(), ax, int(index),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise IOError(f"slicecache: slice read failed for {path} (rc={rc})")
    return out


def mask_bbox(path: str) -> tuple[tuple[int, int, int], tuple[int, int, int]] | None:
    """Nonzero bounding box (lo, hi inclusive) of a mask volume, or None."""
    lib = _load()
    if lib is None:
        raise RuntimeError("slicecache native library unavailable")
    lo = (ctypes.c_int64 * 3)()
    hi = (ctypes.c_int64 * 3)()
    rc = lib.slicecache_mask_bbox(str(path).encode(), lo, hi)
    if rc < 0:
        raise IOError(f"slicecache: bbox failed for {path} (rc={rc})")
    if rc == 1:
        return None
    return (int(lo[0]), int(lo[1]), int(lo[2])), (int(hi[0]), int(hi[1]), int(hi[2]))
