"""Losses: area-weighted MSE (reference: modules/loss.py).

`AreaWeights` come from the native conservative-remap cell areas
(reference obtains them through a CDO self-remap, modules/loss.py:60-68).
`weighted_mse` reproduces WeightedMSELoss semantics
(modules/loss.py:118-156): per-node weights, 'mean' reduction =
sum(w * se) / sum(w) / n_datapoints / n_features.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..sphere.cache import cached_arrays
from ..sphere.remap import area_weights as _area_weights

__all__ = ["AreaWeights", "weighted_mse"]


def AreaWeights(sampling) -> jnp.ndarray:
    """Normalized spherical-Voronoi cell-area weights, shape [V]."""
    key = f"areaw_{sampling.cache_key()}"
    arrs = cached_arrays(key, lambda: {"w": _area_weights(sampling)})
    return jnp.asarray(arrs["w"], dtype=jnp.float32)


def weighted_mse(pred: jnp.ndarray, target: jnp.ndarray,
                 weights: jnp.ndarray | None = None,
                 reduction: str = "mean") -> jnp.ndarray:
    """Area-weighted MSE over [..., node, feature] tensors.

    Leading dims are data points; `weights` is [node].
    """
    se = (pred - target) ** 2
    if weights is None:
        weights = jnp.ones((se.shape[-2],), dtype=se.dtype)
    w = weights.reshape((1,) * (se.ndim - 2) + (-1, 1))
    wse = se * w
    if reduction == "none":
        return wse
    # product of the leading data-point dims (1 for unbatched [V, F]
    # input — a previous special case wrongly divided by V there)
    n_points = int(np.prod(se.shape[:-2]))
    n_feat = se.shape[-1]
    if reduction == "mean":
        return jnp.sum(wse) / jnp.sum(weights) / n_points / n_feat
    if reduction == "sum":
        return jnp.sum(wse) * weights.shape[0]
    raise ValueError(f"invalid reduction {reduction!r}")
