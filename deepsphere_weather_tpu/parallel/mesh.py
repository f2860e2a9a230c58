"""Device meshes and sharding helpers.

The reference is single-process single-GPU with a dead nn.DataParallel
stub (reference: utils_config.py:72-74, train_predict_state.py:297-300).
The TPU-native plan (SURVEY.md §2.14): a 2D mesh over ('data', 'member')
ICI axes — batch-sharded data parallelism with XLA-inserted psum gradient
reduction, and ensemble members (SWAG samples / DeepEnsemble members) laid
out along the 'member' axis. jit + sharding annotations do the collective
insertion; no explicit communication code is needed at these model sizes.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch"]


def make_mesh(n_data: Optional[int] = None, n_member: int = 1,
              devices=None) -> Mesh:
    """Create a ('data', 'member') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_member
    devs = np.asarray(devices[: n_data * n_member]).reshape(n_data, n_member)
    return Mesh(devs, axis_names=("data", "member"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Optional[Mesh]) -> Dict:
    """device_put a loader batch: batched arrays sharded over 'data',
    shared arrays (static) replicated."""
    if mesh is None:
        return {k: jax.numpy.asarray(v) for k, v in batch.items()}
    bsh = batch_sharding(mesh)
    rsh = replicated_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if k == "static":
            out[k] = jax.device_put(v, rsh)
        elif hasattr(v, "ndim") and v.ndim >= 1:
            out[k] = jax.device_put(v, bsh)
        else:
            out[k] = v
    return out
