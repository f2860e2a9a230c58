"""Model geometry: per-level graphs, Chebyshev operators, pool/unpool ops.

Gathers the setup-time products the architectures consume: coarsened
sampling pyramid (reference: modules/my_models_graph.py:374-386 +
modules/utils_models.py:91-102), per-level Laplacian operators
(reference: modules/models.py:62-99) and pooling layers
(reference: modules/layers.py:1152-1191). All cached on disk.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from ..ops.cheb import ChebOperator
from ..ops.pool import build_pool_unpool
from ..sphere import (
    Sampling,
    build_graph,
    build_sampling,
    coarsen_sampling_kwargs,
    check_conv_type,
    check_pool_method,
    check_sampling,
)
from ..sphere.cache import cached_arrays

__all__ = ["ModelGeometry", "build_model_geometry"]


@dataclasses.dataclass
class ModelGeometry:
    """Static geometry consumed by an architecture (pytree constants)."""

    samplings: List[Sampling]
    cheb_ops: List[Optional[ChebOperator]]   # None per level for conv_type='image'
    pools: List                               # len depth-1
    unpools: List
    conv_type: str
    lonlat_ratio: Optional[float]

    @property
    def n_nodes(self) -> List[int]:
        return [s.n_nodes for s in self.samplings]


def _cached_graph_laplacian(name: str, kwargs: Dict, k: int, graph_type: str):
    """Build (or load) the prepared Laplacian in both dense-ready CSR pieces."""
    from scipy import sparse

    samp = build_sampling(name, kwargs)
    # v2: deterministic-lmax era (sphere/graph.py::estimate_lmax fixed v0) —
    # pre-v2 caches hold Laplacians rescaled by a RANDOM ARPACK start
    # vector and would disagree with any fresh build by ~1e-3
    key = f"lap_v2_{samp.cache_key()}_k{k}_{graph_type}"

    def _build():
        g = build_graph(name, kwargs, k=k, graph_type=graph_type, sampling=samp)
        L = g.L.tocsr()
        return {"data": L.data, "indices": L.indices, "indptr": L.indptr,
                "shape": np.asarray(L.shape)}

    arrs = cached_arrays(key, _build)
    L = sparse.csr_matrix((arrs["data"], arrs["indices"], arrs["indptr"]),
                          shape=tuple(arrs["shape"]))
    return samp, L


def build_model_geometry(
    sampling: str,
    sampling_kwargs: Dict,
    depth: int = 3,
    knn: int = 20,
    graph_type: str = "knn",
    conv_type: str = "graph",
    pool_method: str = "max",
    kernel_size_pooling: int = 4,
    dense_threshold: Optional[int] = None,
    use_pallas: Optional[bool] = None,
    operator_dtype=None,
) -> ModelGeometry:
    """`operator_dtype` sets the stored precision of the large-graph BCSR
    Laplacian blocks (bf16 halves their HBM traffic for bf16-activation
    models; None keeps fp32).

    `dense_threshold=None` resolves per backend AND operator dtype: 2048
    with the Pallas BCSR kernel on bf16 operators (HEALPix-16 AR6 train
    step measured 23.7 ms with the 3072-node level sparse vs 27.8 ms
    dense — the O(V^2) dense matvec FLOPs outgrow the MXU win above ~2k
    nodes; 768-node levels still favor dense), 8192 otherwise: the fp32
    kernel's branch-doubled VMEM copies force m_tile 256 and measured
    60.8 ms vs 52.5 ms dense at HEALPix-16, and the CPU ELL gather
    fallback would lose to dense matmul too."""
    sampling = check_sampling(sampling)
    conv_type = check_conv_type(conv_type, sampling)
    pool_method = check_pool_method(pool_method)
    if use_pallas is None:
        # Pallas kernels compile only on TPU; CPU (tests, virtual meshes)
        # falls back to the XLA gather ELL path for large graphs
        import jax
        use_pallas = jax.default_backend() == "tpu"
    if dense_threshold is None:
        import jax.numpy as _jnp
        op_bf16 = (operator_dtype is not None
                   and _jnp.dtype(operator_dtype) == _jnp.dtype(_jnp.bfloat16))
        dense_threshold = 2048 if (use_pallas and op_bf16) else 8192

    coarsening = int(np.sqrt(kernel_size_pooling))
    kwargs_list = [dict(sampling_kwargs)]
    for _ in range(1, depth):
        kwargs_list.append(
            coarsen_sampling_kwargs(sampling, kwargs_list[-1], coarsening))

    samplings: List[Sampling] = []
    cheb_ops: List[Optional[ChebOperator]] = []
    for kw in kwargs_list:
        if conv_type == "graph":
            samp, L = _cached_graph_laplacian(sampling, kw, knn, graph_type)
            samplings.append(samp)
            import jax.numpy as jnp
            if samp.n_nodes <= dense_threshold:
                op = ChebOperator(dense=jnp.asarray(L.todense(),
                                                    dtype=jnp.float32))
            elif use_pallas:
                # Pallas 128x128 BCSR SpMM (2.6% block density at HEALPix-64)
                from ..ops.pallas_spmm import BlockSparseOperator
                op = ChebOperator(bcsr=BlockSparseOperator.from_scipy(
                    L, symmetric=(graph_type in ("knn", "mesh")),
                    dtype=(np.float32 if operator_dtype is None
                           else operator_dtype)))
            else:
                from ..sphere.graph import laplacian_to_ell
                cols, vals = laplacian_to_ell(L)
                op = ChebOperator(ell_cols=jnp.asarray(cols),
                                  ell_vals=jnp.asarray(vals))
            cheb_ops.append(op)
        else:
            samplings.append(build_sampling(sampling, kw))
            cheb_ops.append(None)

    pools, unpools = [], []
    for lvl in range(depth - 1):
        p, u = build_pool_unpool(pool_method, samplings[lvl], samplings[lvl + 1],
                                 kernel_size=kernel_size_pooling)
        pools.append(p)
        unpools.append(u)

    lonlat_ratio = None
    if sampling == "equiangular":
        lonlat_ratio = sampling_kwargs["nlon"] / sampling_kwargs["nlat"]

    return ModelGeometry(samplings=samplings, cheb_ops=cheb_ops,
                         pools=pools, unpools=unpools,
                         conv_type=conv_type, lonlat_ratio=lonlat_ratio)
