"""Chebyshev graph convolution — the innermost hot op (MXU path).

TPU-first re-design of the reference's `conv_cheb`
(reference: modules/layers.py:113-180), which runs a K-term Chebyshev
recurrence `x2 = 2 L x1 - x0` with cuSPARSE SpMM + a dense GEMM. Here:

- **dense path** (default for <= ~8k nodes): the rescaled Laplacian is a
  dense [V, V] operator; `L @ X` with X = [V, B*Fin] is one large MXU
  matmul. At HEALPix-16 (V=3072) the dense L is 36 MB fp32 / 18 MB bf16 —
  cheap in HBM, and the MXU crushes it; this beats any sparse format at
  this scale because the MXU runs at full tilt while SpMM is
  bandwidth/gather bound.
- **ELL path** (large graphs, V >= ~16k): the knn Laplacian has ~k+O(1)
  nonzeros/row; fixed-width ELL (cols [V, W], vals [V, W]) gives static
  shapes. The matvec is a gather + weighted sum, executed either by XLA
  (gather path) or by the Pallas kernel in ops/pallas_spmm.py.

All K Chebyshev basis vectors are combined with a single [B*V, Fin*K] @
[Fin*K, Fout] GEMM, letting XLA fuse the recurrence elementwise ops into
the matmul pipeline.

Weight layout matches the reference: [Fin, K, Fout].

Precision note: dense-path matmuls run at JAX's default TPU matmul
precision (one bf16 pass per operand, fp32 accumulation) — the same
regime as the reference on Ampere GPUs, where torch enables TF32 matmuls
by default. The Pallas BCSR operator selects Precision.HIGHEST for fp32
inputs (exact fp32) since it doubles as a general sparse-linear-algebra
primitive.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["cheb_basis_dense", "cheb_basis_ell", "cheb_conv", "ell_matvec",
           "ChebOperator"]


class ChebOperator:
    """Prepared Laplacian operator for Chebyshev convolutions.

    Wraps one of:
    - a dense [V, V] array (best <= ~8k nodes: the MXU eats [V,V] matmuls)
    - an ELL (cols, vals) pair (XLA gather path)
    - a Pallas BCSR BlockSparseOperator (12k+ nodes: 128x128 block density
      is ~9% at HEALPix-32 and ~2.6% at HEALPix-64)
    and exposes `matvec(X)` over X of shape [V, M]. Construct once per UNet
    level at model build time (see models/geometry.py).
    """

    def __init__(self, dense: Optional[jnp.ndarray] = None,
                 ell_cols: Optional[jnp.ndarray] = None,
                 ell_vals: Optional[jnp.ndarray] = None,
                 bcsr=None):
        if sum(x is not None for x in (dense, ell_cols, bcsr)) != 1:
            raise ValueError("provide exactly one of dense / ell / bcsr")
        self.dense = dense
        self.ell_cols = ell_cols
        self.ell_vals = ell_vals
        self.bcsr = bcsr

    @classmethod
    def from_graph(cls, graph, mode: str = "auto", dense_threshold=None,
                   use_pallas: bool = True, dtype=jnp.float32):
        n = graph.n_nodes
        if mode == "auto":
            if dense_threshold is None:
                # bf16 BCSR beats dense above ~2k nodes on TPU (measured
                # at HEALPix-16); fp32 BCSR (VMEM-limited m_tile) and the
                # CPU ELL gather fallback do not
                bf16 = jnp.dtype(dtype) == jnp.dtype(jnp.bfloat16)
                dense_threshold = 2048 if (use_pallas and bf16) else 8192
            mode = "dense" if n <= dense_threshold else (
                "bcsr" if use_pallas else "ell")
        if mode == "dense":
            return cls(dense=jnp.asarray(graph.laplacian_dense(), dtype=dtype))
        if mode == "bcsr":
            from .pallas_spmm import BlockSparseOperator
            # voronoi (M^-1 L cotan) Laplacians are non-symmetric: the
            # operator then carries a transposed BCSR for the backward
            # matvec (getattr: graphs cached before the field existed are
            # knn/mesh, both symmetric)
            return cls(bcsr=BlockSparseOperator.from_scipy(
                graph.L, symmetric=getattr(graph, "is_symmetric", True),
                dtype=dtype))
        if mode != "ell":
            raise ValueError(f"unknown ChebOperator mode {mode!r}; "
                             "expected 'auto', 'dense', 'bcsr' or 'ell'")
        cols, vals = graph.laplacian_ell()
        return cls(ell_cols=jnp.asarray(cols),
                   ell_vals=jnp.asarray(vals, dtype=dtype))

    @property
    def n_nodes(self) -> int:
        if self.dense is not None:
            return self.dense.shape[0]
        if self.bcsr is not None:
            return self.bcsr.n
        return self.ell_cols.shape[0]

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """L @ x for x of shape [V, M]."""
        if self.dense is not None:
            return jnp.dot(self.dense, x, preferred_element_type=x.dtype)
        if self.bcsr is not None:
            return self.bcsr.matvec(x)
        return ell_matvec(self.ell_cols, self.ell_vals, x)

    def tree_flatten(self):
        return ((self.dense, self.ell_cols, self.ell_vals, self.bcsr), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.dense, obj.ell_cols, obj.ell_vals, obj.bcsr = children
        return obj


jax.tree_util.register_pytree_node(
    ChebOperator, ChebOperator.tree_flatten, ChebOperator.tree_unflatten
)


def ell_matvec(cols: jnp.ndarray, vals: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """ELL SpMM via XLA gather: (vals * x[cols]).sum over the width axis.

    cols: [V, W] int32, vals: [V, W], x: [V, M] -> [V, M].
    """
    gathered = jnp.take(x, cols, axis=0)          # [V, W, M]
    return jnp.einsum("vw,vwm->vm", vals, gathered)


def cheb_basis_dense(L: jnp.ndarray, x: jnp.ndarray, K: int) -> jnp.ndarray:
    """Chebyshev basis [K, V, M] for x [V, M] with dense L (MXU matmuls)."""
    xs = [x]
    if K > 1:
        xs.append(jnp.dot(L, x, preferred_element_type=x.dtype))
    for _ in range(2, K):
        xs.append(2.0 * jnp.dot(L, xs[-1], preferred_element_type=x.dtype) - xs[-2])
    return jnp.stack(xs, axis=0)


def cheb_basis_ell(cols: jnp.ndarray, vals: jnp.ndarray, x: jnp.ndarray,
                   K: int) -> jnp.ndarray:
    mv = functools.partial(ell_matvec, cols, vals)
    xs = [x]
    if K > 1:
        xs.append(mv(x))
    for _ in range(2, K):
        xs.append(2.0 * mv(xs[-1]) - xs[-2])
    return jnp.stack(xs, axis=0)


def cheb_conv(op: ChebOperator, x: jnp.ndarray, weight: jnp.ndarray,
              bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Chebyshev graph convolution.

    Parameters
    ----------
    op : ChebOperator
        Prepared Laplacian (dense or ELL).
    x : [B, V, Fin]
    weight : [Fin, K, Fout]   (reference layout, modules/layers.py:247)
    bias : [Fout] or None

    Returns [B, V, Fout].

    Implementation note: everything is expressed as einsums over the native
    [B, V, F] layout — no explicit permute/reshape. Forcing the
    [V, Fin*B] layout (as a literal translation of the reference's
    torch.sparse.mm pipeline would) makes XLA materialize 4+ HBM-round-trip
    transposes per conv, which dominates step time at these sizes; with
    einsums XLA folds the contractions into MXU-native loops directly.
    """
    B, V, Fin = x.shape
    Fin_w, K, Fout = weight.shape
    if Fin != Fin_w:
        raise ValueError(
            f"input features {Fin} do not match weight in_channels {Fin_w}"
        )
    # mixed precision: compute in x.dtype (bf16 under
    # numeric_precision='bfloat16'), accumulate channel mixes in fp32 on
    # the MXU, emit in x.dtype
    cdt = x.dtype
    weight = weight.astype(cdt)

    # Sparse operators (ELL / Pallas BCSR) consume [V, B*F]: run the whole
    # recurrence NODE-MAJOR ([V, B, F], matvec = free reshape) with a single
    # layout transpose at conv entry and exit. Transposing around every
    # matvec instead (the naive composition) costs ~11% of matvec time at
    # HEALPix-64 (measured 2.20 -> 1.95 ms/matvec).
    node_major = op.dense is None
    if op.dense is not None:
        dense = op.dense.astype(cdt)

        def mv(h):  # [B, V, F] -> [B, V, F]; fp32 accumulation, cdt out
            return jnp.einsum("uv,bvf->buf", dense, h,
                              preferred_element_type=jnp.float32
                              ).astype(cdt)
    else:
        def mv(h):  # node-major [V, B, F]; reshape only — no transpose
            V_, B_, F_ = h.shape
            out = op.matvec(h.reshape(V_, B_ * F_))
            return out.reshape(V_, B_, F_).astype(cdt)

    if node_major:
        x = jnp.transpose(x, (1, 0, 2))                  # [V, B, Fin]

    if Fout < Fin and K > 1:
        # OUTPUT-side evaluation via Clenshaw's algorithm: project channels
        # first (z_k = x @ W_k), then run the K-1 Laplacian matvecs on the
        # NARROW Fout-wide tensors:
        #   b_k = z_k + 2 L b_{k+1} - b_{k+2},  out = z_0 + L b_1 - b_2.
        # Identical result to the T_k(L) recurrence (|spec(L)| <= 1 makes
        # Clenshaw stable) at the same matvec count but width Fout instead
        # of Fin — the matvecs dominate conv cost (2 V^2 B F for dense L),
        # so always run them on the narrow side.
        z = jnp.einsum("vbf,fko->kvbo" if node_major else "bvf,fko->kbvo",
                       x, weight,
                       preferred_element_type=jnp.float32).astype(cdt)
        b1 = z[K - 1]
        b2 = jnp.zeros_like(b1)
        for k in range(K - 2, 0, -1):
            b1, b2 = z[k] + 2.0 * mv(b1) - b2, b1
        out = z[0] + mv(b1) - b2
    elif node_major:
        # INPUT-side, node-major (sparse operators): materialize the
        # [K, V, B, Fin] basis stack and mix with ONE contraction over
        # (k, f). Per-term mixes make XLA write K fp32 [V, B, Fout]
        # partials to HBM and read them back for the add-chain (measured
        # ~2 ms/forward at HEALPix-64); the single einsum keeps all
        # accumulation inside the MXU and writes one output.
        xs = [x]
        if K > 1:
            xs.append(mv(x))
        for _ in range(2, K):
            xs.append(2.0 * mv(xs[-1]) - xs[-2])
        out = jnp.einsum("kvbf,fko->vbo", jnp.stack(xs, axis=0), weight,
                         preferred_element_type=jnp.float32)
    else:
        # INPUT-side, batch-major (dense MXU path): mix each basis term
        # immediately (no [K, ...] stack materialized) — XLA fuses the
        # adds into the GEMMs here and the flagship dense step measures
        # at ~87% of bf16 peak; don't disturb it
        x0 = x
        out = jnp.einsum("bvf,fo->bvo", x0, weight[:, 0],
                         preferred_element_type=jnp.float32)
        if K > 1:
            x1 = mv(x0)
            out = out + jnp.einsum("bvf,fo->bvo", x1, weight[:, 1],
                                   preferred_element_type=jnp.float32)
        for k in range(2, K):
            x2 = 2.0 * mv(x1) - x0
            out = out + jnp.einsum("bvf,fo->bvo", x2, weight[:, k],
                                   preferred_element_type=jnp.float32)
            x0, x1 = x1, x2
    out = out.astype(cdt)
    if node_major:
        out = jnp.transpose(out, (1, 0, 2))              # back to [B, V, Fout]
    if bias is not None:
        out = out + bias.astype(cdt)
    return out
