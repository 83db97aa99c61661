"""ctypes loader for the native C++ preprocessing library.

Build with ``make -C t5_resnet_vqa_tpu/native`` (produces libvqapreproc.so).
``get_lib()`` returns a small wrapper or None when the .so is absent — all
callers treat None as "use the cv2 fallback".
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libvqapreproc.so")
_lock = threading.Lock()
_cached = None
_failed = False


class _NativePreproc:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        self._lib.resize_bilinear_scale.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        self._lib.resize_bilinear_scale.restype = None

    def resize_scale_batch(
        self,
        images: Sequence[np.ndarray],
        out_hw: Tuple[int, int],
        normalize: Optional[Tuple[Sequence[float], Sequence[float]]],
    ) -> np.ndarray:
        H, W = out_hw
        out = np.empty((len(images), H, W, 3), np.float32)
        if normalize is not None:
            mean = np.ascontiguousarray(normalize[0], np.float32)
            std = np.ascontiguousarray(normalize[1], np.float32)
            mean_p = mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            std_p = std.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        else:
            mean_p = None
            std_p = None
        for i, img in enumerate(images):
            img = np.ascontiguousarray(img, np.uint8)
            self._lib.resize_bilinear_scale(
                img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                img.shape[0], img.shape[1],
                out[i].ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                H, W, mean_p, std_p,
            )
        return out


def _try_build() -> bool:
    """Build libvqapreproc.so from the in-tree source with the system
    toolchain (one ~2s g++ invocation). Source ships with the package, so
    first use self-builds instead of requiring a manual make step; any
    failure (no compiler, read-only install) falls back to cv2 silently."""
    src = os.path.join(os.path.dirname(__file__), "preproc.cpp")
    if not os.path.exists(src):
        return False
    import subprocess
    try:
        subprocess.run(
            ["make", "-C", os.path.dirname(__file__), "libvqapreproc.so"],
            check=True, capture_output=True, timeout=120)
    except Exception:
        return False
    return os.path.exists(_LIB_PATH)


def get_lib() -> Optional[_NativePreproc]:
    global _cached, _failed
    with _lock:
        if _cached is not None or _failed:
            return _cached
        if not os.path.exists(_LIB_PATH) and not _try_build():
            _failed = True
            return None
        try:
            _cached = _NativePreproc(ctypes.CDLL(_LIB_PATH))
        except Exception:
            _failed = True
        return _cached
