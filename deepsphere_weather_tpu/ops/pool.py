"""Pooling / unpooling ops between spherical samplings (TPU, static shapes).

Covers the reference's full pooling matrix (reference: modules/layers.py):

- hierarchical HEALPix max/avg pool on nested ordering  -> pure reshape +
  reduce (layers.py:784-941); max returns one-hot indices for unpooling
- hierarchical equiangular max/avg pool -> lax.reduce_window on the 2D grid
  (layers.py:601-781)
- general matrix pooling for ANY sampling pair from conservative remap
  weights (layers.py:948-1103): 'interp' (weighted average), 'maxarea'
  (one-hot of largest-overlap cell), 'maxval' (runtime argmax of weighted
  values, with scatter-based unpooling — replaces the reference's Python
  Counter loop at layers.py:1055-1070 with jit-compatible index ops)

Sparse matrices are carried in fixed-width ELL form (cols/vals arrays) so
every op has static shapes and lowers to gathers + VPU reductions.
All ops take/return [batch, node, channel] arrays; pool ops return
(pooled, idx) where idx is None unless the unpool needs it, mirroring the
reference PoolUnpoolBlock contract (layers.py:1152-1191).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import sparse as _sparse

__all__ = [
    "sparse_to_ell",
    "EllMatrix",
    "GeneralAvgPool", "GeneralAvgUnpool",
    "GeneralMaxAreaPool", "GeneralMaxAreaUnpool",
    "GeneralMaxValPool", "GeneralMaxValUnpool",
    "GeneralLearnPool", "GeneralLearnUnpool",
    "HealpixAvgPool", "HealpixAvgUnpool", "HealpixMaxPool", "HealpixMaxUnpool",
    "EquiangularAvgPool", "EquiangularAvgUnpool",
    "EquiangularMaxPool", "EquiangularMaxUnpool",
    "build_pool_unpool",
]


def sparse_to_ell(mat: "_sparse.spmatrix", dtype=np.float32):
    """Fixed-width ELL (cols, vals) from a scipy sparse matrix.

    Fully vectorized — a per-row Python loop cost multiple seconds per
    UNet level at HEALPix-128 (~197k unpool rows) on every model build.
    """
    csr = mat.tocsr()
    n = csr.shape[0]
    deg = np.diff(csr.indptr)
    width = max(int(deg.max()), 1)
    cols = np.zeros((n, width), dtype=np.int32)
    vals = np.zeros((n, width), dtype=dtype)
    rows = np.repeat(np.arange(n), deg)
    offs = np.arange(csr.nnz) - np.repeat(csr.indptr[:-1], deg)
    cols[rows, offs] = csr.indices
    vals[rows, offs] = csr.data
    return cols, vals


class EllMatrix:
    """A [n_out, n_in] sparse matrix in ELL form; applies along the node axis."""

    def __init__(self, cols, vals, n_in: int):
        self.cols = jnp.asarray(cols)
        self.vals = jnp.asarray(vals)
        self.n_in = int(n_in)

    @classmethod
    def from_scipy(cls, mat):
        cols, vals = sparse_to_ell(mat)
        return cls(cols, vals, mat.shape[1])

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, n_in, C] -> [B, n_out, C] (dtype-preserving: weights are
        cast to the activation dtype so bf16 activations stay bf16)."""
        gathered = jnp.take(x, self.cols, axis=1)           # [B, n_out, W, C]
        return jnp.einsum("ow,bowc->boc", self.vals.astype(x.dtype), gathered)

    def tree_flatten(self):
        return ((self.cols, self.vals), self.n_in)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.cols, obj.vals = children
        obj.n_in = aux
        return obj


jax.tree_util.register_pytree_node(
    EllMatrix, EllMatrix.tree_flatten, EllMatrix.tree_unflatten
)


# ---------------------------------------------------------------------------
# General (matrix) pooling — works for any sampling pair
# ---------------------------------------------------------------------------

def _register_pool_pytree(cls, array_fields, static_fields):
    """Register a pool op class as a pytree so pooling ops (and their ELL
    arrays) can be passed as jit ARGUMENTS instead of closure constants —
    closure-captured device constants are re-uploaded on every call on
    tunneled TPU runtimes, which dominates step time."""

    def flatten(obj):
        return (tuple(getattr(obj, f) for f in array_fields),
                tuple(getattr(obj, f) for f in static_fields))

    def unflatten(aux, children):
        obj = cls.__new__(cls)
        for f, v in zip(array_fields, children):
            setattr(obj, f, v)
        for f, v in zip(static_fields, aux):
            setattr(obj, f, v)
        return obj

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)


class GeneralAvgPool:
    """Weighted-average pooling with a row-normalized remap matrix ('interp').

    Accepts a scipy sparse matrix or a pre-built EllMatrix (the pooling
    cache stores the ELL arrays directly)."""

    def __init__(self, pool_matrix):
        self.mat = (pool_matrix if isinstance(pool_matrix, EllMatrix)
                    else EllMatrix.from_scipy(pool_matrix))

    def __call__(self, x) -> Tuple[jnp.ndarray, None]:
        return self.mat.apply(x), None


class GeneralAvgUnpool:
    def __init__(self, unpool_matrix):
        self.mat = (unpool_matrix if isinstance(unpool_matrix, EllMatrix)
                    else EllMatrix.from_scipy(unpool_matrix))

    def __call__(self, x, idx=None) -> jnp.ndarray:
        return self.mat.apply(x)


def _onehot_argmax_rows(mat: "_sparse.spmatrix") -> "_sparse.csr_matrix":
    """One-hot matrix selecting each row's max-weight column (maxarea semantics,
    reference layers.py:991-1036). Vectorized via the ELL layout (padding
    slots hold zero values, so they never win the per-row argmax of the
    positive remap weights)."""
    ell_cols, ell_vals = sparse_to_ell(mat)
    n_out, n_in = mat.shape
    j = ell_vals.argmax(axis=1)
    nonempty = ell_vals.max(axis=1) > 0
    rows = np.nonzero(nonempty)[0]
    cols = ell_cols[rows, j[rows]]
    return _sparse.csr_matrix(
        (np.ones(len(rows), dtype=np.float32), (rows, cols)), shape=(n_out, n_in)
    )


class GeneralMaxAreaPool:
    def __init__(self, pool_matrix):
        self.mat = EllMatrix.from_scipy(_onehot_argmax_rows(pool_matrix))

    def __call__(self, x) -> Tuple[jnp.ndarray, None]:
        return self.mat.apply(x), None


class GeneralMaxAreaUnpool:
    def __init__(self, unpool_matrix):
        self.mat = EllMatrix.from_scipy(_onehot_argmax_rows(unpool_matrix))

    def __call__(self, x, idx=None) -> jnp.ndarray:
        return self.mat.apply(x)


class GeneralMaxValPool:
    """Runtime argmax of weighted values; returns source indices for unpooling."""

    def __init__(self, pool_matrix):
        if isinstance(pool_matrix, EllMatrix):
            cols, vals, n_in = (pool_matrix.cols, pool_matrix.vals,
                                pool_matrix.n_in)
        else:
            cols, vals = sparse_to_ell(pool_matrix)
            n_in = pool_matrix.shape[1]
        self.cols = jnp.asarray(cols)
        self.vals = jnp.asarray(vals)
        self.n_in = n_in

    def __call__(self, x):
        gathered = jnp.take(x, self.cols, axis=1)                 # [B, D, W, C]
        weighted = gathered * self.vals[None, :, :, None].astype(x.dtype)
        mask = (self.vals > 0)[None, :, :, None]
        weighted = jnp.where(mask, weighted, -jnp.inf)
        pooled = jnp.max(weighted, axis=2)   # max, not take_along_axis(argmax)
        j = jnp.argmax(weighted, axis=2)                          # [B, D, C]
        # chosen source node per (batch, dst, channel): one-hot contraction
        # over the narrow W axis beats a gather kernel on TPU
        onehot = jax.nn.one_hot(j, self.cols.shape[1], axis=2,
                                dtype=jnp.int32)                  # [B, D, W, C]
        src_idx = jnp.einsum("bdwc,dw->bdc", onehot, self.cols)
        return pooled, src_idx


class GeneralMaxValUnpool:
    """Scatter pooled values back to their argmax source nodes."""

    def __init__(self, n_src: int):
        self.n_src = int(n_src)

    def __call__(self, x, idx) -> jnp.ndarray:
        B, D, C = x.shape
        out = jnp.zeros((B, self.n_src, C), dtype=x.dtype)
        b = jnp.arange(B)[:, None, None]
        c = jnp.arange(C)[None, None, :]
        return out.at[b, idx, c].add(x)


def _ell_logits(mat) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    cols, vals = sparse_to_ell(mat)
    mask = vals > 0
    logits = np.where(mask, np.log(np.maximum(vals, 1e-20)), -1e9)
    return cols, mask, logits.astype(np.float32)


class GeneralLearnPool:
    """LEARNED sparse pooling on the conservative-remap sparsity pattern.

    The reference leaves pool_method='learn' as NotImplementedError with a
    SparseLinear sketch (reference: modules/layers.py:1107-1133); here it
    is implemented for real: trainable logits over each destination row's
    fixed support, softmax-normalized so pooling stays a convex combination
    of source nodes (conservativity of the mean is preserved for any
    learned state). Logits initialize to the conservative 'interp' weights
    (softmax(log w) == w for row-normalized w), so training starts exactly
    at interp pooling. The logits live in the MODEL params pytree — call
    with `w=params[...]`; calling without `w` uses the frozen init.
    """

    def __init__(self, pool_matrix):
        cols, mask, logits = _ell_logits(pool_matrix)
        self.cols = jnp.asarray(cols)
        self.mask = jnp.asarray(mask)
        self.init_logits = jnp.asarray(logits)

    def init(self) -> jnp.ndarray:
        return self.init_logits

    def __call__(self, x, w=None) -> Tuple[jnp.ndarray, None]:
        logits = self.init_logits if w is None else w
        logits = jnp.where(self.mask, logits, -1e9)
        p = jax.nn.softmax(logits, axis=1).astype(x.dtype)        # [D, W]
        gathered = jnp.take(x, self.cols, axis=1)                 # [B, D, W, C]
        return jnp.einsum("bdwc,dw->bdc", gathered, p), None


class GeneralLearnUnpool:
    """Learned sparse unpooling over the transposed (unpool) sparsity."""

    def __init__(self, unpool_matrix):
        cols, mask, logits = _ell_logits(unpool_matrix)
        self.cols = jnp.asarray(cols)
        self.mask = jnp.asarray(mask)
        self.init_logits = jnp.asarray(logits)

    def init(self) -> jnp.ndarray:
        return self.init_logits

    def __call__(self, x, idx=None, w=None) -> jnp.ndarray:
        logits = self.init_logits if w is None else w
        logits = jnp.where(self.mask, logits, -1e9)
        p = jax.nn.softmax(logits, axis=1).astype(x.dtype)
        gathered = jnp.take(x, self.cols, axis=1)
        return jnp.einsum("bdwc,dw->bdc", gathered, p)


# ---------------------------------------------------------------------------
# Hierarchical HEALPix pooling (nested ordering -> reshape)
# ---------------------------------------------------------------------------

class HealpixAvgPool:
    def __init__(self, kernel_size: int = 4):
        self.k = int(kernel_size)

    def __call__(self, x):
        B, V, C = x.shape
        return x.reshape(B, V // self.k, self.k, C).mean(axis=2), None


class HealpixAvgUnpool:
    def __init__(self, kernel_size: int = 4):
        self.k = int(kernel_size)

    def __call__(self, x, idx=None):
        B, V, C = x.shape
        return jnp.repeat(x, self.k, axis=1)


class HealpixMaxPool:
    def __init__(self, kernel_size: int = 4):
        self.k = int(kernel_size)

    def __call__(self, x):
        B, V, C = x.shape
        g = x.reshape(B, V // self.k, self.k, C)
        # max + argmax, NOT take_along_axis(argmax): the gather kernel for
        # take_along_axis dominated the whole forward pass on TPU (profiled
        # at ~90% of step time); max is a plain VPU reduction.
        pooled = jnp.max(g, axis=2)
        idx = jnp.argmax(g, axis=2)                 # [B, V/k, C] for unpool
        return pooled, idx


class HealpixMaxUnpool:
    def __init__(self, kernel_size: int = 4):
        self.k = int(kernel_size)

    def __call__(self, x, idx):
        B, D, C = x.shape
        onehot = jax.nn.one_hot(idx, self.k, axis=2, dtype=x.dtype)  # [B, D, k, C]
        return (onehot * x[:, :, None, :]).reshape(B, D * self.k, C)


# ---------------------------------------------------------------------------
# Hierarchical equiangular pooling (2D grid)
# ---------------------------------------------------------------------------

def _to_2d(x, nlat, nlon):
    B, V, C = x.shape
    return x.reshape(B, nlat, nlon, C)


class EquiangularAvgPool:
    def __init__(self, nlat: int, nlon: int, kernel_size: int = 4):
        self.nlat, self.nlon = nlat, nlon
        self.c = int(np.sqrt(kernel_size))

    def __call__(self, x):
        g = _to_2d(x, self.nlat, self.nlon)
        B, H, W, C = g.shape
        # floor-crop odd dims (reference AvgPool2d semantics: the trailing
        # odd row/col never reaches the pooled grid — the coarsening rule
        # nlat//c produces e.g. 23 -> 11 at Equiangular_400km_tropics)
        Hc, Wc = H // self.c, W // self.c
        g = g[:, : Hc * self.c, : Wc * self.c]
        g = g.reshape(B, Hc, self.c, Wc, self.c, C)
        pooled = g.mean(axis=(2, 4))
        return pooled.reshape(B, -1, x.shape[-1]), None


class EquiangularAvgUnpool:
    def __init__(self, nlat: int, nlon: int, kernel_size: int = 4,
                 fine_nlat: int = None, fine_nlon: int = None):
        self.nlat, self.nlon = nlat, nlon  # coarse dims
        self.c = int(np.sqrt(kernel_size))
        # exact fine-grid dims (reference uses F.interpolate to the target
        # size); defaults reproduce the even case
        self.fine_nlat = fine_nlat if fine_nlat is not None else nlat * self.c
        self.fine_nlon = fine_nlon if fine_nlon is not None else nlon * self.c

    def __call__(self, x, idx=None):
        g = _to_2d(x, self.nlat, self.nlon)
        # nearest-neighbor resize to the fine grid: for even dims the index
        # map floor(i*H/(c*H)) == i//c, i.e. exactly repeat-by-c
        rows = np.floor(np.arange(self.fine_nlat)
                        * self.nlat / self.fine_nlat).astype(np.int32)
        cols = np.floor(np.arange(self.fine_nlon)
                        * self.nlon / self.fine_nlon).astype(np.int32)
        g = jnp.take(jnp.take(g, rows, axis=1), cols, axis=2)
        return g.reshape(x.shape[0], -1, x.shape[-1])


class EquiangularMaxPool:
    def __init__(self, nlat: int, nlon: int, kernel_size: int = 4):
        self.nlat, self.nlon = nlat, nlon
        self.c = int(np.sqrt(kernel_size))

    def __call__(self, x):
        g = _to_2d(x, self.nlat, self.nlon)
        B, H, W, C = g.shape
        Hc, Wc = H // self.c, W // self.c
        g = g[:, : Hc * self.c, : Wc * self.c]   # floor-crop (MaxPool2d)
        g = g.reshape(B, Hc, self.c, Wc, self.c, C)
        g = jnp.transpose(g, (0, 1, 3, 2, 4, 5)).reshape(
            B, Hc, Wc, self.c * self.c, C)
        pooled = jnp.max(g, axis=3)        # see HealpixMaxPool: avoid gather
        idx = jnp.argmax(g, axis=3)
        return pooled.reshape(B, -1, C), idx.reshape(B, -1, C)


class EquiangularMaxUnpool:
    def __init__(self, nlat: int, nlon: int, kernel_size: int = 4,
                 fine_nlat: int = None, fine_nlon: int = None):
        self.nlat, self.nlon = nlat, nlon  # coarse dims
        self.c = int(np.sqrt(kernel_size))
        self.fine_nlat = fine_nlat if fine_nlat is not None else nlat * self.c
        self.fine_nlon = fine_nlon if fine_nlon is not None else nlon * self.c

    def __call__(self, x, idx):
        B, D, C = x.shape
        k2 = self.c * self.c
        onehot = jax.nn.one_hot(idx, k2, axis=2, dtype=x.dtype)     # [B, D, k2, C]
        g = onehot * x[:, :, None, :]
        g = g.reshape(B, self.nlat, self.nlon, self.c, self.c, C)
        g = jnp.transpose(g, (0, 1, 3, 2, 4, 5)).reshape(
            B, self.nlat * self.c, self.nlon * self.c, C)
        # odd fine dims: the cropped trailing row/col receives zeros (the
        # max-pool never selected from it — MaxUnpool2d semantics)
        pad_h = self.fine_nlat - self.nlat * self.c
        pad_w = self.fine_nlon - self.nlon * self.c
        if pad_h or pad_w:
            g = jnp.pad(g, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        return g.reshape(B, -1, C)


_register_pool_pytree(GeneralAvgPool, ("mat",), ())
_register_pool_pytree(GeneralAvgUnpool, ("mat",), ())
_register_pool_pytree(GeneralMaxAreaPool, ("mat",), ())
_register_pool_pytree(GeneralMaxAreaUnpool, ("mat",), ())
_register_pool_pytree(GeneralMaxValPool, ("cols", "vals"), ("n_in",))
_register_pool_pytree(GeneralMaxValUnpool, (), ("n_src",))
_register_pool_pytree(GeneralLearnPool, ("cols", "mask", "init_logits"), ())
_register_pool_pytree(GeneralLearnUnpool, ("cols", "mask", "init_logits"), ())
_register_pool_pytree(HealpixAvgPool, (), ("k",))
_register_pool_pytree(HealpixAvgUnpool, (), ("k",))
_register_pool_pytree(HealpixMaxPool, (), ("k",))
_register_pool_pytree(HealpixMaxUnpool, (), ("k",))
_register_pool_pytree(EquiangularAvgPool, (), ("nlat", "nlon", "c"))
_register_pool_pytree(EquiangularAvgUnpool, (),
                      ("nlat", "nlon", "c", "fine_nlat", "fine_nlon"))
_register_pool_pytree(EquiangularMaxPool, (), ("nlat", "nlon", "c"))
_register_pool_pytree(EquiangularMaxUnpool, (),
                      ("nlat", "nlon", "c", "fine_nlat", "fine_nlon"))


# ---------------------------------------------------------------------------
# Factory (reference: PoolUnpoolBlock, modules/layers.py:1152-1191)
# ---------------------------------------------------------------------------

def build_pool_unpool(pool_method: str, src_sampling, dst_sampling,
                      kernel_size: int = 4, cache: bool = True):
    """Build (pool, unpool) for a sampling pair.

    'max'/'avg' use hierarchical pooling (healpix/equiangular only);
    'interp'/'maxarea'/'maxval' use conservative remap matrices.
    """
    method = pool_method.lower()
    name = src_sampling.name

    if method in ("max", "avg"):
        if name == "healpix":
            ratio = src_sampling.n_nodes // dst_sampling.n_nodes
            if method == "max":
                return HealpixMaxPool(ratio), HealpixMaxUnpool(ratio)
            return HealpixAvgPool(ratio), HealpixAvgUnpool(ratio)
        if name == "equiangular":
            kw_src = src_sampling.kwargs_dict
            kw_dst = dst_sampling.kwargs_dict
            if method == "max":
                return (EquiangularMaxPool(kw_src["nlat"], kw_src["nlon"], kernel_size),
                        EquiangularMaxUnpool(kw_dst["nlat"], kw_dst["nlon"], kernel_size,
                                             fine_nlat=kw_src["nlat"],
                                             fine_nlon=kw_src["nlon"]))
            return (EquiangularAvgPool(kw_src["nlat"], kw_src["nlon"], kernel_size),
                    EquiangularAvgUnpool(kw_dst["nlat"], kw_dst["nlon"], kernel_size,
                                         fine_nlat=kw_src["nlat"],
                                         fine_nlon=kw_src["nlon"]))
        raise ValueError(
            f"hierarchical pooling '{method}' requires healpix/equiangular, got {name}"
        )

    if method in ("interp", "maxarea", "maxval", "learn"):
        from ..sphere.cache import cached_arrays
        from ..sphere.remap import build_pooling_matrices

        def _build():
            pool_mat, unpool_mat = build_pooling_matrices(src_sampling, dst_sampling)
            pc, pv = sparse_to_ell(pool_mat)
            uc, uv = sparse_to_ell(unpool_mat)
            return {"pool_cols": pc, "pool_vals": pv,
                    "unpool_cols": uc, "unpool_vals": uv}

        key = f"poolmat_{src_sampling.cache_key()}__{dst_sampling.cache_key()}"
        arrs = cached_arrays(key, _build) if cache else _build()
        # the cache stores exactly the ELL arrays the pool ops consume —
        # 'interp'/'maxval' build from them directly; 'maxarea'/'learn'
        # reconstruct a CSR for their (vectorized) argmax/logit transforms
        pool_em = EllMatrix(arrs["pool_cols"], arrs["pool_vals"],
                            src_sampling.n_nodes)
        if method == "interp":
            return (GeneralAvgPool(pool_em),
                    GeneralAvgUnpool(EllMatrix(arrs["unpool_cols"],
                                               arrs["unpool_vals"],
                                               dst_sampling.n_nodes)))
        if method == "maxval":
            return (GeneralMaxValPool(pool_em),
                    GeneralMaxValUnpool(src_sampling.n_nodes))
        pool_ell = _ell_to_csr(arrs["pool_cols"], arrs["pool_vals"],
                               src_sampling.n_nodes)
        unpool_ell = _ell_to_csr(arrs["unpool_cols"], arrs["unpool_vals"],
                                 dst_sampling.n_nodes)
        if method == "maxarea":
            return GeneralMaxAreaPool(pool_ell), GeneralMaxAreaUnpool(unpool_ell)
        return GeneralLearnPool(pool_ell), GeneralLearnUnpool(unpool_ell)

    raise ValueError(f"unknown pool_method {pool_method!r}")


def _ell_to_csr(cols: np.ndarray, vals: np.ndarray, n_in: int):
    n_out, w = cols.shape
    rows = np.repeat(np.arange(n_out), w)
    mat = _sparse.csr_matrix(
        (vals.ravel(), (rows, cols.ravel())), shape=(n_out, n_in)
    )
    mat.eliminate_zeros()
    return mat
