# -*- coding: utf-8 -*-
"""ctypes bindings for the native raster IO core (tiffio.cpp).

Builds ``libclimsr_io.so`` with g++ on first use (cached next to the source;
falls back to a temp dir for read-only installs). Set ``CLIMSR_NO_NATIVE=1``
to force the pure-Python codecs. All entry points degrade gracefully: a
nonzero native return code routes the call to ``climsr_tpu.io.geotiff``.
"""
from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).with_name("tiffio.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build(lib_path: Path) -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC), "-o", str(lib_path), "-lz", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        logger.warning("native build failed (%s); using pure-Python raster IO", e)
        return False


def load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("CLIMSR_NO_NATIVE"):
        return None
    src_hash = hashlib.sha1(_SRC.read_bytes()).hexdigest()[:12]
    candidates = [
        _SRC.parent / f"libclimsr_io_{src_hash}.so",
        Path(tempfile.gettempdir()) / f"libclimsr_io_{src_hash}.so",
    ]
    for lib_path in candidates:
        if not lib_path.exists():
            try:
                if not _build(lib_path):
                    continue
            except OSError:
                continue
        try:
            lib = ctypes.CDLL(str(lib_path))
        except OSError:
            continue
        lib.climsr_tiff_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.climsr_tiff_probe.restype = ctypes.c_int
        lib.climsr_tiff_read_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
        ]
        lib.climsr_tiff_read_f32.restype = ctypes.c_int
        lib.climsr_nearest_resize_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32, ctypes.c_int32,
        ]
        lib.climsr_tiff_read_batch_f32.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
        logger.info("native raster IO loaded from %s", lib_path)
        return _LIB
    return None


def native_available() -> bool:
    return load_native() is not None


def read_raster_native(path) -> Optional[np.ndarray]:
    """Decode a single-band TIFF via the native core; None -> use Python codec."""
    lib = load_native()
    if lib is None:
        return None
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    if lib.climsr_tiff_probe(str(path).encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    out = np.empty((h.value, w.value), np.float32)
    rc = lib.climsr_tiff_read_f32(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h.value, w.value
    )
    return out if rc == 0 else None


def nearest_resize_native(src: np.ndarray, dh: int, dw: int) -> Optional[np.ndarray]:
    lib = load_native()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.float32)
    dst = np.empty((dh, dw), np.float32)
    lib.climsr_nearest_resize_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), src.shape[0], src.shape[1],
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw,
    )
    return dst


def read_tiles_batch_native(paths: List[str], h: int, w: int, n_threads: int = 8) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Decode a batch of same-shaped tiles with C++ threads (no GIL).

    Returns (tiles[n, h, w], status[n]); entries with status != 0 must be
    re-read via the Python codec.
    """
    lib = load_native()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, h, w), np.float32)
    status = np.empty((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.climsr_tiff_read_batch_f32(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, n_threads,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out, status
