"""BatchNorm running-statistics re-estimation (SWAG bn_update).

Reference parity: modules/utils_swag.py:58-165 — after sampling SWAG
weights, one pass over the training set re-estimates every BatchNorm
layer's running mean/var with per-batch momentum b/(n+b) (cumulative
average across batches), running the full AR loop per batch so every
model call in the rollout contributes statistics in order.

TPU-native design: the model stays pure — running stats live in an
explicit `norm_state` pytree (models/unet.py::init_norm_state). A jitted
forward collects each AR iteration's batch statistics through the model's
`stats_out` channel (traced values returned as jit outputs); the tiny
sequential running update happens on host. `norm_state` is then passed to
eval-mode forwards (`model.apply(..., norm_state=..., train=False)`).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.ar import ARIndexer
from ..data.loader import AutoregressiveDataLoader, AutoregressiveDataset
from ..engine.step import assemble_input, keep_first_feedback

__all__ = ["bn_update", "make_bn_stats_fn"]


def make_bn_stats_fn(model, indexer: ARIndexer, n_scan_iterations: int):
    """Jitted fn(params, batch, geom) -> list (one per AR iteration) of
    per-layer batch statistics, following the training rollout exactly
    (prediction feedback, stack_most_recent_prediction semantics)."""
    in_pos = jnp.asarray(indexer.input_pos)
    out_pos = jnp.asarray(indexer.output_pos)
    # same feedback policy as the training loss (engine/step.py): a slot
    # predicted by an earlier iteration keeps that prediction under
    # keep-first semantics, so the statistics see the distribution the
    # eval rollout will actually produce
    keep_first = keep_first_feedback(indexer)

    @jax.jit
    def stats_fn(params, batch, geom):
        dyn = batch["dynamic"]
        bc = batch.get("bc")
        static = batch.get("static")
        buf = dyn
        written = jnp.zeros((dyn.shape[1],), dtype=bool)
        all_stats = []
        for i in range(n_scan_iterations):
            x = assemble_input(buf, bc, static, in_pos[i])
            stats: Dict = {}
            y = model.apply(params, x, geom=geom, train=True,
                            stats_out=stats)
            if keep_first:
                prev = jnp.take(buf, out_pos[i], axis=1)
                wm = jnp.take(written, out_pos[i])
                y = jnp.where(wm[None, :, None, None], prev, y)
                written = written.at[out_pos[i]].set(True)
            buf = buf.at[:, out_pos[i]].set(y)
            all_stats.append(stats)
        return all_stats

    return stats_fn


def _running_update(state: Dict, stats: Dict, momentum: float) -> None:
    """Recursive in-place running-moment update: stats trees mirror the
    model's norm_state nesting (1 level for plain ConvBlocks, 2 for
    ResBlocks), with {mean, var} array leaves."""
    if "mean" in stats and not isinstance(stats["mean"], dict):
        state["mean"] = ((1 - momentum) * state["mean"]
                         + momentum * np.asarray(stats["mean"]))
        state["var"] = ((1 - momentum) * state["var"]
                        + momentum * np.asarray(stats["var"]))
        return
    for key, sub in stats.items():
        _running_update(state[key], sub, momentum)


def bn_update(model, params, *, data_dynamic, data_bc=None, data_static=None,
              scaler=None, scaler_bc=None,
              input_k, output_k, forecast_cycle, ar_iterations,
              batch_size: int = 16, max_batches: Optional[int] = None,
              num_workers: int = 2, verbose: bool = False) -> Dict:
    """One pass over `data_dynamic` re-estimating BN running statistics.

    Returns the norm_state pytree ({} when the model has no BatchNorm).
    max_batches bounds the pass (the reference walks the full training
    set; a few hundred batches estimate the same statistics).
    """
    if not getattr(model, "has_batch_norm", False):
        return {}
    indexer = ARIndexer.build(input_k, output_k, forecast_cycle,
                              ar_iterations)
    ds = AutoregressiveDataset(data_dynamic, indexer, data_bc=data_bc,
                               data_static=data_static, scaler=scaler,
                               scaler_bc=scaler_bc)
    loader = AutoregressiveDataLoader(ds, batch_size=batch_size,
                                      shuffle=False, num_workers=num_workers)
    n_scan = indexer.ar_iterations + 1
    stats_fn = make_bn_stats_fn(model, indexer, n_scan)
    geom = jax.device_put(model.geometry_pytree())

    # reference reset_bn: running mean 0 / var 1, momenta reset
    # (utils_swag.py:31-55)
    state = jax.tree_util.tree_map(np.asarray, model.init_norm_state())
    n_seen = 0
    nb = 0
    for batch in loader:
        b = batch["dynamic"].shape[0]
        momentum = b / (n_seen + b)                    # _get_momenta parity
        dev_batch = {k: jnp.asarray(v) for k, v in batch.items()
                     if k in ("dynamic", "bc", "static")}
        per_iter_stats = stats_fn(params, dev_batch, geom)
        # sequential running update, same order as the reference's AR loop
        # (each model call applies the SAME per-batch momentum)
        for stats in per_iter_stats:
            _running_update(state, stats, momentum)
        n_seen += b
        nb += 1
        if max_batches is not None and nb >= max_batches:
            break
    if verbose:
        print(f"bn_update: {nb} batches, {n_seen} samples, "
              f"{n_scan} AR calls each")
    return state
