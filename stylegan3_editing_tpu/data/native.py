"""ctypes bindings for the native (C++) host-side batch preprocessor.

The shared library builds on first use with g++ (cached next to the source);
callers fall back to the numpy path when no compiler is available. Role
parity: the native data-path layer the reference gets from torch's C++
DataLoader/transform stack (SURVEY.md "native code" requirement).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent.parent.parent / "native" / "batch_preprocess.cpp"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_library() -> Optional[ctypes.CDLL]:
    if not _SRC.exists():
        return None
    digest = hashlib.sha1(_SRC.read_bytes()).hexdigest()[:12]
    cache_dir = Path(os.environ.get("SG3TPU_CACHE",
                                    Path.home() / ".cache" / "sg3tpu"))
    cache_dir.mkdir(parents=True, exist_ok=True)
    lib_path = cache_dir / f"libbatch_preprocess_{digest}.so"
    if not lib_path.exists():
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", str(lib_path),
               str(_SRC), "-pthread"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        return ctypes.CDLL(str(lib_path))
    except OSError:
        return None


def get_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build_library()
        if _LIB is not None:
            _LIB.normalize_batch.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int,
            ]
            _LIB.normalize_batch.restype = None
    return _LIB


def normalize_batch(images: np.ndarray, flip: Optional[np.ndarray] = None,
                    num_threads: int = 4) -> np.ndarray:
    """uint8 NHWC batch → float32 [-1, 1] NHWC, optional per-image mirror.

    Uses the C++ kernel when available, numpy otherwise (identical results).
    """
    assert images.dtype == np.uint8 and images.ndim == 4
    images = np.ascontiguousarray(images)
    n, h, w, c = images.shape
    lib = get_library()
    if lib is not None:
        out = np.empty((n, h, w, c), np.float32)
        flip_arr = (np.ascontiguousarray(flip.astype(np.uint8))
                    if flip is not None else None)
        lib.normalize_batch(
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            (flip_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
             if flip_arr is not None else
             ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8))),
            n, h, w, c, num_threads)
        return out
    # numpy fallback
    out = images.astype(np.float32) * (2.0 / 255.0) - 1.0
    if flip is not None:
        out[flip.astype(bool)] = out[flip.astype(bool)][:, :, ::-1]
    return out
