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
    from scipy.spatial import cKDTree

    from ..sphere.remap import clean_polygon, voronoi_cells

    lib = _load()
    assert lib is not None

    sv_src = voronoi_cells(src)
    sv_dst = voronoi_cells(dst)
    src_area = sv_src.calculate_areas()
    dst_area = sv_dst.calculate_areas()

    def flatten(sv, centers):
        # duplicate Voronoi vertices (degenerate generators) must be removed
        # before clipping, exactly like the numpy path
        polys = [clean_polygon(np.asarray(sv.vertices[r], dtype=np.float64), c)
                 for r, c in zip(sv.regions, centers)]
        offsets = np.zeros(len(polys) + 1, dtype=np.int64)
        offsets[1:] = np.cumsum([len(p) for p in polys])
        flat = np.concatenate(polys, axis=0) if polys else np.zeros((0, 3))
        return np.ascontiguousarray(flat), offsets

    src_centers = np.ascontiguousarray(src.coords_3d, dtype=np.float64)
    dst_centers = np.ascontiguousarray(dst.coords_3d, dtype=np.float64)
    src_flat, src_off = flatten(sv_src, src_centers)
    dst_flat, dst_off = flatten(sv_dst, dst_centers)

    # Candidate pairs via KDTree ball queries (same pruning as numpy path)
    def poly_radius(flat, off, centers):
        r = np.zeros(len(off) - 1)
        for i in range(len(off) - 1):
            p = flat[off[i]:off[i + 1]]
            if len(p):
                r[i] = np.sqrt(max(2 - 2 * float(np.min(p @ centers[i])), 0.0))
        return r

    r_src = poly_radius(src_flat, src_off, src_centers)
    r_dst = poly_radius(dst_flat, dst_off, dst_centers)
    tree = cKDTree(src_centers)
    r_max = float(r_src.max()) if len(r_src) else 0.0
    pairs = []
    for d in range(dst_centers.shape[0]):
        for s in tree.query_ball_point(dst_centers[d], r_dst[d] + r_max + 1e-9):
            pairs.append((d, s))
    pairs = np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
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
