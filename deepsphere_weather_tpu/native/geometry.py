"""ctypes bindings for the C++ geometry library (libdsw_geometry.so).

Provides the hot setup-time routine: conservative spherical-polygon-overlap
weights between two Voronoi tessellations (the CDO replacement, see
sphere/remap.py). Falls back gracefully when the library is not built.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> Path:
    return Path(__file__).parent / "libdsw_geometry.so"


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
        lib.dsw_conservative_weights.restype = ctypes.c_longlong
        lib.dsw_conservative_weights.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,  # dst polys flat
            ctypes.POINTER(ctypes.c_longlong),                    # dst poly offsets
            ctypes.POINTER(ctypes.c_double),                      # dst centers
            ctypes.c_longlong,                                    # n_dst
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,  # src polys flat
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_longlong,                                    # n_src
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,  # candidate pairs
            ctypes.POINTER(ctypes.c_double),                      # out areas per pair
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def conservative_weights(src, dst):
    """C++-accelerated counterpart of remap._conservative_weights_numpy."""
    from scipy import sparse
    from ..sphere.remap import (_regions_as_arrays, candidate_pairs,
                                poly_radii, voronoi_cells)

    lib = _load()
    assert lib is not None

    sv_src = voronoi_cells(src)
    sv_dst = voronoi_cells(dst)
    src_area = sv_src.calculate_areas()
    dst_area = sv_dst.calculate_areas()

    src_centers = np.ascontiguousarray(src.coords_3d, dtype=np.float64)
    dst_centers = np.ascontiguousarray(dst.coords_3d, dtype=np.float64)
    # polygon prep and candidate pruning are SHARED with the numpy
    # backend (sphere.remap) so the two paths cannot drift; only the
    # clipping kernel itself is native
    src_polys = _regions_as_arrays(sv_src, src_centers)
    dst_polys = _regions_as_arrays(sv_dst, dst_centers)

    def flatten(polys):
        offsets = np.zeros(len(polys) + 1, dtype=np.int64)
        offsets[1:] = np.cumsum([len(p) for p in polys])
        flat = (np.concatenate(polys, axis=0) if polys
                else np.zeros((0, 3)))
        return np.ascontiguousarray(flat, dtype=np.float64), offsets

    src_flat, src_off = flatten(src_polys)
    dst_flat, dst_off = flatten(dst_polys)
    r_src = poly_radii(src_polys, src_centers)
    r_dst = poly_radii(dst_polys, dst_centers)
    dst_idx, src_idx = candidate_pairs(src_centers, dst_centers,
                                       r_src, r_dst)
    pairs = np.ascontiguousarray(
        np.stack([dst_idx, src_idx], axis=1).astype(np.int64))
    out = np.zeros(len(pairs), dtype=np.float64)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    n_written = lib.dsw_conservative_weights(
        ptr(dst_flat, ctypes.c_double), dst_flat.shape[0],
        ptr(dst_off, ctypes.c_longlong), ptr(dst_centers, ctypes.c_double),
        dst_centers.shape[0],
        ptr(src_flat, ctypes.c_double), src_flat.shape[0],
        ptr(src_off, ctypes.c_longlong), ptr(src_centers, ctypes.c_double),
        src_centers.shape[0],
        ptr(np.ascontiguousarray(pairs), ctypes.c_longlong), pairs.shape[0],
        ptr(out, ctypes.c_double),
    )
    assert n_written == len(pairs)
    keep = out > 1e-16
    W = sparse.csr_matrix(
        (out[keep], (pairs[keep, 0], pairs[keep, 1])),
        shape=(dst_centers.shape[0], src_centers.shape[0]),
    )
    return W, src_area, dst_area
