"""Device meshes and sharding helpers.

The reference is single-process single-GPU with a dead nn.DataParallel
stub (reference: utils_config.py:72-74, train_predict_state.py:297-300).
The TPU-native plan (SURVEY.md §2.14): a mesh over ('data', 'node',
'member') ICI axes —

- 'data': batch-sharded data parallelism with XLA-inserted psum gradient
  reduction;
- 'node': spatial sharding of the sphere (the sequence/context-parallel
  analog, SURVEY.md §5.7) for resolutions whose activations exceed one
  chip — nested HEALPix ordering keeps hierarchical pooling local to a
  shard, and XLA inserts the gather collectives the Laplacian matvec
  needs;
- 'member': SWAG / DeepEnsemble members.

jit + sharding annotations do the collective insertion; no explicit
communication code is needed at these model sizes.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "node_sharding",
           "replicated_sharding", "shard_batch", "training_mesh",
           "put_device_dataset", "shard_window_indices"]


def make_mesh(n_data: Optional[int] = None, n_member: int = 1,
              n_node: int = 1, devices=None) -> Mesh:
    """Create a ('data', 'node', 'member') mesh over the available devices.

    Axes of size 1 cost nothing; the historical 2D ('data', 'member')
    layout is the n_node=1 special case.
    """
    if devices is None:
        devices = jax.devices()
    if n_member * n_node > len(devices):
        raise ValueError(
            f"make_mesh: n_member*n_node = {n_member * n_node} exceeds the "
            f"{len(devices)} available devices (a zero-device mesh would "
            f"fail later with an opaque sharding error)")
    if n_data is None:
        n_data = len(devices) // (n_member * n_node)
        if len(devices) % (n_member * n_node):
            import warnings
            warnings.warn(
                f"make_mesh: {len(devices)} devices are not divisible by "
                f"n_member*n_node = {n_member * n_node}; using "
                f"{n_data * n_node * n_member} devices and leaving "
                f"{len(devices) - n_data * n_node * n_member} idle",
                stacklevel=2)
    if n_data * n_node * n_member > len(devices):
        raise ValueError(
            f"make_mesh: {n_data}x{n_node}x{n_member} mesh needs "
            f"{n_data * n_node * n_member} devices, have {len(devices)}")
    devs = np.asarray(devices[: n_data * n_node * n_member]).reshape(
        n_data, n_node, n_member)
    return Mesh(devs, axis_names=("data", "node", "member"))


def training_mesh(n_data_parallel: int = 1, n_node_parallel: int = 1,
                  n_member: int = 1) -> Optional[Mesh]:
    """Mesh from the config's mesh settings; None for the 1x1x1 case.

    `None` keeps single-chip runs on the plain (mesh-free) jit path —
    identical math, no GSPMD pass. Raises if the requested layout needs
    more devices than `jax.devices()` provides (the config validated only
    the types; device count is a runtime property of the host).
    """
    import jax

    n_data = max(int(n_data_parallel), 1)
    n_node = max(int(n_node_parallel), 1)
    n_member = max(int(n_member), 1)
    if n_data * n_node * n_member == 1:
        return None
    have = len(jax.devices())
    need = n_data * n_node * n_member
    if need > have:
        raise RuntimeError(
            f"training mesh {n_data}(data) x {n_node}(node) x "
            f"{n_member}(member) needs {need} devices; this host has "
            f"{have} (set n_data_parallel/n_node_parallel to fit, or run "
            "under more chips)")
    return make_mesh(n_data=n_data, n_node=n_node, n_member=n_member)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def node_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard [B, ..., V, F] arrays over ('data' for batch, 'node' for V).

    The node axis is `ndim - 2` under the framework's layout contract
    (feature axis last, node axis second-to-last): [B, W, V, F] -> axis 2,
    [B, V, F] -> axis 1.
    """
    node_axis = ndim - 2
    spec = [None] * (node_axis + 1)
    spec[0] = "data"
    spec[node_axis] = "node"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _mesh_axis_size(mesh: Mesh, name: str) -> int:
    try:
        return mesh.shape[name]
    except (KeyError, TypeError):
        return 1


# batch keys the jitted train/validation steps consume (engine/step.py
# loss_fn); the loader's time arrays stay host-side — uploading them costs
# two extra tunnel round-trips per batch for data the device never reads
TRAIN_BATCH_KEYS = ("dynamic", "bc", "static")


def put_device_dataset(dataset, mesh: Optional[Mesh] = None) -> Dict:
    """Upload a dataset's pre-scaled mirror + static fields to device HBM
    ONCE (device-resident training data). Returns the `data` dict consumed
    by engine.step.make_cached_train_step: per-step H2D shrinks from the
    [B, W, V, F] window to a [B, W] int32 index array.

    Sharding: timesteps must be visible to every data shard (any batch
    gathers arbitrary rows), so arrays replicate over 'data'/'member'; a
    >1 'node' axis shards the node dimension exactly like shard_batch.
    """
    dyn, bc, static = dataset.mirror_arrays()
    if mesh is None:
        put = jax.numpy.asarray
        put_static = jax.numpy.asarray
    else:
        with_node = _mesh_axis_size(mesh, "node") > 1
        rsh = replicated_sharding(mesh)
        sh = NamedSharding(mesh, P(None, "node", None)) if with_node else rsh
        ssh = NamedSharding(mesh, P("node", None)) if with_node else rsh

        def put(v):
            return jax.device_put(v, sh)

        def put_static(v):
            return jax.device_put(v, ssh)

    return {"dynamic": put(dyn),
            "bc": put(bc) if bc is not None else None,
            "static": put_static(static) if static is not None else None}


def shard_window_indices(widx, mesh: Optional[Mesh]):
    """Upload a [B, W] window-index batch, sharded over 'data'."""
    if mesh is None:
        return jax.numpy.asarray(widx)
    return jax.device_put(widx, batch_sharding(mesh))


def shard_batch(batch: Dict, mesh: Optional[Mesh]) -> Dict:
    """device_put a loader batch: batched arrays sharded over 'data' (and
    the node axis over 'node' when that mesh axis is >1), shared arrays
    (static) replicated (or node-sharded). Only float arrays (the keys the
    device steps read) are transferred; integer/time arrays pass through
    as host numpy."""
    if mesh is None:
        return {k: (jax.numpy.asarray(v) if k in TRAIN_BATCH_KEYS else v)
                for k, v in batch.items()}
    with_node = _mesh_axis_size(mesh, "node") > 1
    bsh = batch_sharding(mesh)
    rsh = replicated_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if k not in TRAIN_BATCH_KEYS:
            out[k] = v
        elif k == "static":
            # [V, F]
            out[k] = jax.device_put(
                v, NamedSharding(mesh, P("node")) if with_node else rsh)
        elif hasattr(v, "ndim") and v.ndim >= 3 and with_node:
            # [B, ..., V, F] dynamic / bc — node axis is second-to-last
            out[k] = jax.device_put(v, node_sharding(mesh, ndim=v.ndim))
        elif hasattr(v, "ndim") and v.ndim >= 1:
            out[k] = jax.device_put(v, bsh)
        else:
            out[k] = v
    return out
