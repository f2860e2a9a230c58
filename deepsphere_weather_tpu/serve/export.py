"""AOT export of the AR rollout via `jax.export` (StableHLO artifacts).

An artifact directory is fully self-contained:

    rollout.jaxexport   serialized jax.export.Exported of the block rollout
                        with params, static features and graph geometry
                        baked in as constants
    meta.json           shapes, AR settings, platforms, versions
    scaler_dynamic.npz  (optional) scaler for the dynamic fields
    scaler_bc.npz       (optional) scaler for the boundary conditions

The exported callable is
    f(hist)                         when the model takes no BC features
    f(hist, bc_block)               otherwise
with hist [B, H, V, F_dyn] float32 (scaled units) and bc_block
[B, block_size, n_input_k, V, F_bc] float32 (scaled units); it returns
(new_hist, preds [B, block_size, n_out, V, F_dyn]). Run it repeatedly,
feeding new_hist back, for rollouts of any length — exactly the
`ar_blocks` execution model of the prediction engine
(reference: scripts_training/predict_state.py:223-224).

On TPU the artifact may contain Mosaic (Pallas) custom calls for the
block-sparse Laplacian operator; those are tied to the compiler version
(jax.export's custom-call stability warning) — re-export after major
jaxlib upgrades. CPU/fp32 exports are pure StableHLO.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional, Sequence

import jax
import numpy as np

from ..data.ar import ARIndexer

__all__ = ["ExportedRollout", "export_rollout", "export_ensemble_rollout",
           "save_artifact", "load_artifact"]

_ARTIFACT_NAME = "rollout.jaxexport"
_META_NAME = "meta.json"


@dataclasses.dataclass
class ExportedRollout:
    """A (de)serializable exported rollout + its metadata."""

    exported: "jax.export.Exported"
    meta: dict

    @property
    def has_bc(self) -> bool:
        return self.meta["n_bc_features"] > 0

    def call(self, hist, bc_block=None):
        """Trace-/jit-compatible call of the exported rollout."""
        if self.has_bc:
            if bc_block is None:
                raise ValueError("this artifact requires a bc_block "
                                 f"[B, {self.meta['block_size']}, "
                                 f"{self.meta['n_input_k']}, V, "
                                 f"{self.meta['n_bc_features']}]")
            return self.exported.call(hist, bc_block)
        if bc_block is not None:
            raise ValueError("this artifact takes no boundary conditions")
        return self.exported.call(hist)


def export_rollout(model, params, *, input_k: Sequence[int],
                   output_k: Sequence[int], forecast_cycle: int,
                   batch_size: int, block_size: int,
                   static: Optional[np.ndarray] = None,
                   n_bc_features: int = 0,
                   timestep_hours: Optional[float] = None,
                   feature_order: Optional[Sequence[str]] = None,
                   platforms: Optional[Sequence[str]] = None) -> ExportedRollout:
    """Export the block-rollout of `model` with `params` baked in.

    `static` are the unscaled-but-prepared static features [V, F_static]
    exactly as fed during training (they become artifact constants).
    `platforms` defaults to the current JAX default backend; pass e.g.
    ("tpu", "cpu") for a multi-platform artifact (only valid when every op
    lowers for all requested platforms — the Pallas BCSR operator is
    TPU-only, so multi-platform export requires a dense/ELL model build).
    """
    from jax import export as jexport

    from ..engine.step import make_rollout_block

    indexer = ARIndexer.build(list(input_k), list(output_k),
                              forecast_cycle, 1)
    rollout, H = make_rollout_block(model, indexer, block_size, jit=False)

    V = model.input_n_node
    f_dyn = model.output_n_feature
    geom = model.geometry_pytree()
    static_arr = None if static is None else np.asarray(static, np.float32)

    # exported indexers use stack_most_recent_prediction=True (no
    # keep-first written-mask), so the artifact signature stays
    # (hist[, bc_block]) -> (new_hist, preds)
    if n_bc_features > 0:
        def fn(hist, bc_block):
            h, _, preds = rollout(params, hist, None, bc_block, static_arr,
                                  geom)
            return h, preds
        specs = (
            jax.ShapeDtypeStruct((batch_size, H, V, f_dyn), np.float32),
            jax.ShapeDtypeStruct(
                (batch_size, block_size, len(input_k), V, n_bc_features),
                np.float32),
        )
    else:
        def fn(hist):
            h, _, preds = rollout(params, hist, None, None, static_arr, geom)
            return h, preds
        specs = (
            jax.ShapeDtypeStruct((batch_size, H, V, f_dyn), np.float32),
        )

    plats = tuple(platforms) if platforms else (jax.default_backend(),)
    # Mosaic (Pallas) kernels serialize as tpu_custom_call — allowed
    # explicitly; harmless for artifacts that contain none
    disabled = [jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")]
    exported = jexport.export(jax.jit(fn), platforms=plats,
                              disabled_checks=disabled)(*specs)

    meta = {
        "format_version": 1,
        "jax_version": jax.__version__,
        "platforms": list(plats),
        "batch_size": batch_size,
        "block_size": block_size,
        "history_size": H,
        "n_node": V,
        "n_dynamic_features": f_dyn,
        "n_bc_features": n_bc_features,
        "n_static_features": 0 if static_arr is None else
                             int(static_arr.shape[-1]),
        "n_input_k": len(input_k),
        "input_k": [int(k) for k in input_k],
        "output_k": [int(k) for k in output_k],
        "forecast_cycle": int(forecast_cycle),
        "timestep_hours": timestep_hours,
        "feature_order": list(feature_order) if feature_order else None,
    }
    return ExportedRollout(exported=exported, meta=meta)


def export_ensemble_rollout(model, member_params, *, input_k: Sequence[int],
                            output_k: Sequence[int], forecast_cycle: int,
                            batch_size: int, block_size: int,
                            static: Optional[np.ndarray] = None,
                            n_bc_features: int = 0,
                            timestep_hours: Optional[float] = None,
                            feature_order: Optional[Sequence[str]] = None,
                            platforms: Optional[Sequence[str]] = None
                            ) -> ExportedRollout:
    """Export a member-stacked (vmapped) ensemble rollout.

    `member_params` is a params pytree with a leading member axis (from
    `prob.SWAG.sample_members` or stacked DeepEnsemble checkpoints). The
    exported callable rolls ALL members in one device program — the
    TPU-parallel replacement for the reference's sequential member loop
    (reference: modules/swag_predictions.py:59-91):

        f(hist [M, B, H, V, F] (, bc_block [B, S, n_in, V, Fb]))
            -> (new_hist [M, ...], preds [M, B, S, n_out, V, F])

    Members consume the SAME boundary conditions; each member's own
    predictions feed back into its history slice. Serving starts every
    member from one analysis state by broadcasting the initial history
    (ForecastService does this automatically).
    """
    from jax import export as jexport

    from ..engine.step import make_rollout_block

    leaves = jax.tree_util.tree_leaves(member_params)
    if not leaves:
        raise ValueError("member_params is empty")
    n_members = int(leaves[0].shape[0])
    indexer = ARIndexer.build(list(input_k), list(output_k),
                              forecast_cycle, 1)
    rollout, H = make_rollout_block(model, indexer, block_size, jit=False)
    vmapped = jax.vmap(rollout, in_axes=(0, 0, None, None, None, None))

    V = model.input_n_node
    f_dyn = model.output_n_feature
    geom = model.geometry_pytree()
    static_arr = None if static is None else np.asarray(static, np.float32)

    hist_spec = jax.ShapeDtypeStruct(
        (n_members, batch_size, H, V, f_dyn), np.float32)
    if n_bc_features > 0:
        def fn(hist, bc_block):
            h, _, preds = vmapped(member_params, hist, None, bc_block,
                                  static_arr, geom)
            return h, preds
        specs = (hist_spec, jax.ShapeDtypeStruct(
            (batch_size, block_size, len(input_k), V, n_bc_features),
            np.float32))
    else:
        def fn(hist):
            h, _, preds = vmapped(member_params, hist, None, None,
                                  static_arr, geom)
            return h, preds
        specs = (hist_spec,)

    plats = tuple(platforms) if platforms else (jax.default_backend(),)
    disabled = [jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")]
    exported = jexport.export(jax.jit(fn), platforms=plats,
                              disabled_checks=disabled)(*specs)

    meta = {
        "format_version": 1,
        "jax_version": jax.__version__,
        "platforms": list(plats),
        "n_members": n_members,
        "batch_size": batch_size,
        "block_size": block_size,
        "history_size": H,
        "n_node": V,
        "n_dynamic_features": f_dyn,
        "n_bc_features": n_bc_features,
        "n_static_features": 0 if static_arr is None else
                             int(static_arr.shape[-1]),
        "n_input_k": len(input_k),
        "input_k": [int(k) for k in input_k],
        "output_k": [int(k) for k in output_k],
        "forecast_cycle": int(forecast_cycle),
        "timestep_hours": timestep_hours,
        "feature_order": list(feature_order) if feature_order else None,
    }
    return ExportedRollout(exported=exported, meta=meta)


def save_artifact(path, rollout: ExportedRollout, scaler=None,
                  scaler_bc=None) -> Path:
    """Persist an ExportedRollout (+ optional scalers) to a directory."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    (path / _ARTIFACT_NAME).write_bytes(rollout.exported.serialize())
    (path / _META_NAME).write_text(json.dumps(rollout.meta, indent=1))
    if scaler is not None:
        scaler.save(path / "scaler_dynamic.npz")
    if scaler_bc is not None:
        scaler_bc.save(path / "scaler_bc.npz")
    return path


def load_artifact(path):
    """-> (ExportedRollout, scaler | None, scaler_bc | None)."""
    from jax import export as jexport

    from ..data.scalers import load_scaler

    path = Path(path)
    blob = (path / _ARTIFACT_NAME).read_bytes()
    meta = json.loads((path / _META_NAME).read_text())
    exported = jexport.deserialize(blob)
    scaler = scaler_bc = None
    if (path / "scaler_dynamic.npz").exists():
        scaler = load_scaler(path / "scaler_dynamic.npz")
    if (path / "scaler_bc.npz").exists():
        scaler_bc = load_scaler(path / "scaler_bc.npz")
    return ExportedRollout(exported=exported, meta=meta), scaler, scaler_bc
