"""Disk cache for setup-time geometry artifacts.

Graphs, Laplacians, pooling matrices and remap weights are deterministic
functions of the sampling spec; they are computed once and cached as .npz
under `~/.cache/deepsphere_weather_tpu` (override with env var
DSW_TPU_CACHE). The reference achieves the same effect by reusing CDO
weight files on disk (reference: modules/my_remap.py:198-337).
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path
from typing import Callable, Dict, Optional

import numpy as np
from scipy import sparse

__all__ = ["cache_dir", "cached_sparse", "cached_arrays"]


def cache_dir() -> Path:
    d = os.environ.get("DSW_TPU_CACHE")
    if d is None:
        d = os.path.join(os.path.expanduser("~"), ".cache", "deepsphere_weather_tpu")
    p = Path(d)
    p.mkdir(parents=True, exist_ok=True)
    return p


def _key_path(key: str, suffix: str) -> Path:
    h = hashlib.sha1(key.encode()).hexdigest()[:16]
    return cache_dir() / f"{h}_{suffix}.npz"


def cached_sparse(key: str, builder: Callable[[], sparse.spmatrix]) -> sparse.csr_matrix:
    path = _key_path(key, "sparse")
    if path.exists():
        z = np.load(path)
        return sparse.csr_matrix(
            (z["data"], z["indices"], z["indptr"]), shape=tuple(z["shape"])
        )
    mat = builder().tocsr()
    np.savez_compressed(
        path, data=mat.data, indices=mat.indices, indptr=mat.indptr,
        shape=np.asarray(mat.shape),
    )
    return mat


def cached_arrays(key: str, builder: Callable[[], Dict[str, np.ndarray]],
                  refresh: bool = False) -> Dict[str, np.ndarray]:
    path = _key_path(key, "arrays")
    if path.exists() and not refresh:
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    out = builder()
    np.savez_compressed(path, **out)
    return out
