"""ctypes bindings for the native host runtime (``native/aliby_host.cpp``).

Build happens on first import (g++ -O3 -shared); failures degrade to the
pure-Python path — the data plane checks :func:`available` before routing
decodes here.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path

import numpy as np

logger = logging.getLogger("aliby_tpu")

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "aliby_host.cpp"
_LIB_PATH = Path(__file__).resolve().parent / "_aliby_host.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                str(_SRC), "-o", str(_LIB_PATH), "-lz", "-pthread",
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as e:
        logger.warning("native build failed: %s", e)
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() or _SRC.stat().st_mtime > _LIB_PATH.stat().st_mtime:
            if not _SRC.exists() or not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError as e:
            logger.warning("native load failed: %s", e)
            return None
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.aliby_tiff_info.argtypes = [ctypes.c_char_p, u32p, u32p, u32p, u32p]
        lib.aliby_tiff_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_uint64,
            u32p, u32p, u32p,
        ]
        lib.aliby_tiff_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_void_p, ctypes.c_uint64, u32p, u32p, u32p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def tiff_info(path: str | Path):
    """(width, height, bits, pages) or None."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    b = ctypes.c_uint32()
    p = ctypes.c_uint32()
    rc = lib.aliby_tiff_info(str(path).encode(), w, h, b, p)
    if rc != 0:
        return None
    return w.value, h.value, b.value, p.value


def tiff_decode(path: str | Path, page: int = 0) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    info = tiff_info(path)
    if info is None:
        return None
    width, height, bits, _pages = info
    dtype = np.uint16 if bits == 16 else np.uint8
    out = np.empty((height, width), dtype)
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    b = ctypes.c_uint32()
    rc = lib.aliby_tiff_decode(
        str(path).encode(), page,
        out.ctypes.data_as(ctypes.c_void_p), out.nbytes, w, h, b,
    )
    if rc != 0:
        return None
    return out


def tiff_decode_batch(paths, pages=None) -> np.ndarray | None:
    """Decode N same-shaped TIFF pages in parallel -> (N, H, W)."""
    lib = _load()
    if lib is None or not paths:
        return None
    info = tiff_info(paths[0])
    if info is None:
        return None
    width, height, bits, _ = info
    dtype = np.uint16 if bits == 16 else np.uint8
    n = len(paths)
    out = np.empty((n, height, width), dtype)
    arr_t = ctypes.c_char_p * n
    c_paths = arr_t(*[str(p).encode() for p in paths])
    c_pages = (ctypes.c_int * n)(*(pages or [0] * n))
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    b = ctypes.c_uint32()
    rc = lib.aliby_tiff_decode_batch(
        c_paths, c_pages, n,
        out.ctypes.data_as(ctypes.c_void_p),
        out.nbytes // n, w, h, b,
    )
    if rc != 0:
        return None
    return out
