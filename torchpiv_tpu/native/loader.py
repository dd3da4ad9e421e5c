"""ctypes binding + on-demand build of the native fastio library.

Compiles ``fastio.cpp`` with g++ on first use (cached next to the source or
in ``~/.cache/torchpiv_tpu``), exposes a batched GIL-free read+decode, and
degrades gracefully to the Python decoder when no compiler is available.
"""
from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
import threading
from typing import List, Optional, Tuple

import numpy as np

log = logging.getLogger("torchpiv_tpu")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build_dir() -> str:
    src_dir = os.path.dirname(os.path.abspath(__file__))
    if os.access(src_dir, os.W_OK):
        return src_dir
    d = os.path.join(os.path.expanduser("~"), ".cache", "torchpiv_tpu")
    os.makedirs(d, exist_ok=True)
    return d


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        src = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fastio.cpp")
        so = os.path.join(_build_dir(), "libfastio.so")
        tag = so + ".srchash"
        try:
            # Only ever load a binary this process (or a prior run on this
            # machine) built from the checked-out source: a sidecar hash of
            # fastio.cpp gates the load, so a stale or foreign .so (e.g. from
            # a copied checkout where mtimes are useless) is always rebuilt.
            with open(src, "rb") as f:
                src_hash = hashlib.sha256(f.read()).hexdigest()
            built_from = None
            if os.path.exists(tag):
                with open(tag) as f:
                    built_from = f.read().strip()
            if not os.path.exists(so) or built_from != src_hash:
                with tempfile.TemporaryDirectory() as td:
                    tmp_so = os.path.join(td, "libfastio.so")
                    subprocess.run(
                        ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                         "-o", tmp_so, src, "-lpthread"],
                        check=True, capture_output=True,
                    )
                    os.replace(tmp_so, so)
                with open(tag, "w") as f:
                    f.write(src_hash)
            lib = ctypes.CDLL(so)
            lib.fastio_probe_bmp8.restype = ctypes.c_int
            lib.fastio_probe_bmp8.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]
            lib.fastio_read_batch.restype = None
            lib.fastio_read_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32)]
            lib.fastio_write_table.restype = ctypes.c_int
            lib.fastio_write_table.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_char_p]
            _lib = lib
        except Exception as e:  # no g++, build error, load error
            log.info("native fastio unavailable (%s); using Python decode", e)
            _lib_failed = True
        return _lib


def available() -> bool:
    return _load() is not None


def probe_gray(path: str) -> Optional[Tuple[int, int]]:
    """(H, W) if the native decoder can handle this file, else None.

    Handles 8-bit palette BMP, uncompressed grayscale TIFF (8/16-bit)
    and Netpbm PGM P5 (8/16-bit).
    """
    lib = _load()
    if lib is None:
        return None
    dims = (ctypes.c_int64 * 2)()
    if lib.fastio_probe_bmp8(path.encode(), dims) != 0:
        return None
    return int(dims[0]), int(dims[1])


def read_batch_gray(
    paths: List[str], shape: Tuple[int, int], threads: int = 8
) -> Tuple[np.ndarray, np.ndarray]:
    """Read+decode a batch of same-shape gray frames on C++ threads.

    Formats: 8-bit palette BMP, uncompressed grayscale TIFF at 8 or 16
    bits/sample, and Netpbm PGM P5 at 8/16 bits (16-bit scaled to 8 via
    the high byte, matching the reference's cv2.IMREAD_GRAYSCALE output
    for such files).

    Returns ``(frames [n, H, W] uint8, status [n] int32)``; status != 0 means
    that file failed (caller falls back / skips, preserving the reference's
    skip-unreadable-pair semantics).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native fastio not available")
    H, W = shape
    n = len(paths)
    out = np.empty((n, H, W), dtype=np.uint8)
    status = np.empty(n, dtype=np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.fastio_read_batch(
        arr, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        H, W, threads,
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out, status


def write_table(path: str, header: str, arr: np.ndarray,
                sep: str = ", ") -> None:
    """Write a ``[N, C]`` float64 array as a headed "%.6f" CSV on the C
    side (GIL released) — byte-identical to
    ``np.savetxt(fmt="%.6f", delimiter=sep, header=header, comments="")``
    but ~30x faster (a 16k-row table is ~2 ms vs ~50-80 ms of Python
    %-formatting).  Raises on failure so callers can fall back."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native fastio not available")
    arr = np.ascontiguousarray(arr, dtype=np.float64)
    if arr.ndim != 2:
        raise ValueError(f"expected [N, C] table, got shape {arr.shape}")
    rc = lib.fastio_write_table(
        path.encode(), header.encode(),
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        arr.shape[0], arr.shape[1], sep.encode(),
    )
    if rc != 0:
        raise OSError(f"fastio_write_table({path!r}) failed with rc={rc}")


# Backwards-compatible aliases (the batch decoder now handles TIFF too).
probe_bmp8 = probe_gray
read_batch_bmp8 = read_batch_gray
