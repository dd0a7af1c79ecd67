"""ctypes binding for the native C++ batch decoder (native/dataloader.cpp).

Builds the shared library on first use (g++, cached next to the source);
decodes BMP batches with a thread pool directly into the resident NHWC
uint8 array. Non-BMP files (or a missing toolchain) fall back to the PIL
path in data/neudet.py — behavior is identical, only faster.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
    )


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.join(_native_dir(), "dataloader.cpp")
    so = os.path.join(_native_dir(), "libievmloader.so")
    if not os.path.exists(src):
        return None
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            "-o", so, src, "-lpthread",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, OSError):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.ievm_decode_batch.restype = ctypes.c_int
    lib.ievm_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.ievm_decode_one.restype = ctypes.c_int
    lib.ievm_decode_one.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.ievm_s2d_batch.restype = ctypes.c_int
    lib.ievm_s2d_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _LIB = _build_and_load()
            _TRIED = True
        return _LIB


def decode_batch_native(
    paths: List[str], size: Tuple[int, int], num_threads: int = 8,
    s2d: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """→ (images uint8, ok mask bool [N]); raises if lib unavailable.

    ``s2d=True`` emits the space-to-depth serving layout (H/2, W/2, 12)
    directly from the decoder (the static-int8 stem's input format).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    h, w = size
    n = len(paths)
    shape = (n, h // 2, w // 2, 12) if s2d else (n, h, w, 3)
    out = np.empty(shape, dtype=np.uint8)
    status = np.zeros(n, dtype=np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.ievm_decode_batch(
        c_paths, n, w, h, int(s2d),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_threads,
    )
    return out, status.astype(bool)


def s2d_batch_native(
    imgs: np.ndarray, num_threads: int = 0
) -> Optional[np.ndarray]:
    """(N, H, W, 3) uint8 → (N, H/2, W/2, 12) via the C++ row-interleave,
    or None when the native lib is unavailable (caller falls back to numpy).
    ``num_threads=0`` → one thread per available core (capped at 16)."""
    lib = get_lib()
    if lib is None:
        return None
    n, h, w, c = imgs.shape
    if c != 3 or h % 2 or w % 2:
        return None
    imgs = np.ascontiguousarray(imgs)
    out = np.empty((n, h // 2, w // 2, 12), dtype=np.uint8)
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, 16)
    ok = lib.ievm_s2d_batch(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), num_threads,
    )
    return out if ok == n else None
