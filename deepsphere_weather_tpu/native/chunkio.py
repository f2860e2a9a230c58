"""ctypes binding for the parallel chunk reader (libdsw_chunkio.so).

Native data-loading core (the reference's loader is torch's C++ DataLoader
machinery): reads + zlib-inflates many zarr chunk files concurrently into
one contiguous numpy buffer. `read_chunks` returns False when the library
is not built — callers fall back to the pure-Python path.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import List, Optional

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> Path:
    return Path(__file__).parent / "libdsw_chunkio.so"


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not path.exists():
        return None
    try:
        lib = ctypes.CDLL(str(path))
        lib.dsw_read_chunks.restype = ctypes.c_longlong
        lib.dsw_read_chunks.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),  # paths
            ctypes.c_longlong,                # n
            ctypes.c_longlong,                # chunk_bytes
            ctypes.c_int32,                   # compressed
            ctypes.POINTER(ctypes.c_ubyte),   # out
            ctypes.POINTER(ctypes.c_ubyte),   # status (1 = missing)
            ctypes.c_int32,                   # n_threads
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


#: codec ids shared with chunkio.cpp
CODEC_RAW, CODEC_ZLIB, CODEC_BLOSC = 0, 1, 2
_CODECS = {None: CODEC_RAW, "raw": CODEC_RAW, False: CODEC_RAW,
           "zlib": CODEC_ZLIB, True: CODEC_ZLIB, "blosc": CODEC_BLOSC}


def read_chunks(paths: List[str], out: np.ndarray, compressed,
                fill_value=0,
                n_threads: Optional[int] = None) -> bool:
    """Fill out[i] (shape [n, *chunk_shape], C-contiguous) from chunk
    files; rows whose file is absent are set to `fill_value` (the reader
    reports absence itself — no check/read race). `compressed` is a codec
    name (None/"zlib"/"blosc"; bools kept for the legacy zlib flag).
    Returns False if the native library is unavailable (caller must use
    the Python path)."""
    lib = _load()
    if lib is None:
        return False
    codec = _CODECS[compressed]
    if codec == CODEC_BLOSC:
        # same system library the C++ side dlopens; if ctypes can't find
        # it, neither will the native reader — use the Python path (which
        # raises a clear error)
        from . import bloscio

        if not bloscio.available():
            return False
    n = len(paths)
    if n == 0:
        return True
    assert out.flags["C_CONTIGUOUS"] and out.shape[0] == n
    chunk_bytes = out.nbytes // n
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    status = np.zeros(n, dtype=np.uint8)
    if n_threads is None:
        import os

        # thread pool sized to actual CPU affinity — oversubscription on
        # small hosts is slower than single-threaded inflate
        try:
            n_cpu = len(os.sched_getaffinity(0))
        except AttributeError:  # non-Linux
            n_cpu = os.cpu_count() or 1
        n_threads = max(1, min(n_cpu, n, 16))
    rc = lib.dsw_read_chunks(
        arr, n, chunk_bytes, codec,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        int(n_threads))
    if rc < 0:
        raise IOError(f"native chunk read failed with code {rc}")
    for i in np.nonzero(status)[0]:
        out[i].fill(fill_value)
    return True
