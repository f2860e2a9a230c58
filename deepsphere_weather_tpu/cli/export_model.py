"""Export a trained experiment directory to a serving artifact.

Produces a self-contained `jax.export` StableHLO artifact of the AR block
rollout (trained params, static features and graph geometry baked in) plus
the data scalers — everything `serve.ForecastService` needs, with no
dependency on the model-building code at load time. The reference has no
deployment path; its closest analog re-imports the training stack
(scripts_training/predict_state.py:52-215).

Usage:
    python -m deepsphere_weather_tpu.cli.export_model \
        --model_dir EXP/<model-name> --data_dir DATA \
        --out artifacts/<model-name> [--batch_size 4] [--block_size 10]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(model_dir, data_dir, out=None, batch_size: int = 4,
         block_size: int = 10, platforms=None, swag_samples: int = 0,
         sampling_scale: float = 0.5, swag_cov: bool = True,
         member_dirs=None, seed: int = 0, verbose: bool = True):
    """Ensemble artifacts: `swag_samples=N` samples N member param sets
    from the experiment's SWAG checkpoint (model_swag.npz); `member_dirs`
    stacks the checkpoints of separately trained DeepEnsemble members.
    Either way the artifact rolls all members in one vmapped program."""
    import jax

    from ..config import (get_ar_settings, get_model_settings,
                          get_training_settings, read_config_file)
    from ..data import (SphericalDataset, StaticDataset,
                        get_ar_model_tensor_info, load_scaler)
    from ..models import get_model
    from ..serve import export_ensemble_rollout, export_rollout, save_artifact
    from ..utils import Checkpointer

    model_dir, data_dir = Path(model_dir), Path(data_dir)
    cfg = read_config_file(model_dir / "config.json")
    model_settings = get_model_settings(cfg)
    ar_settings = get_ar_settings(cfg)

    data_dynamic = SphericalDataset.open(
        data_dir / "Data" / "dynamic" / "time_chunked" / "dynamic.zarr")
    bc_path = data_dir / "Data" / "bc" / "time_chunked" / "bc.zarr"
    data_bc = SphericalDataset.open(bc_path) if bc_path.exists() else None
    static_path = data_dir / "Data" / "static.zarr"
    data_static = (StaticDataset.open(static_path)
                   if static_path.exists() else None)
    scaler_path = data_dir / "Scalers" / "GlobalStandardScaler_dynamic.npz"
    scaler = load_scaler(scaler_path) if scaler_path.exists() else None
    scaler_bc_path = data_dir / "Scalers" / "GlobalStandardScaler_bc.npz"
    scaler_bc = (load_scaler(scaler_bc_path) if scaler_bc_path.exists()
                 else None)

    tensor_info = get_ar_model_tensor_info(ar_settings, data_dynamic,
                                           data_static=data_static,
                                           data_bc=data_bc)
    saved_info_path = model_dir / "tensor_info.json"
    if saved_info_path.exists():
        from ..config import check_same_dict
        check_same_dict(json.loads(json.dumps(tensor_info, default=str)),
                        json.loads(saved_info_path.read_text()))

    model_kwargs = {k: v for k, v in model_settings.items()
                    if k != "architecture_name"}
    model_kwargs["pool_method"] = str(model_kwargs["pool_method"]).lower()
    model_kwargs["numeric_precision"] = get_training_settings(cfg).get(
        "numeric_precision", "float32")
    model = get_model(model_settings["architecture_name"], tensor_info,
                      **model_kwargs)
    template = model.init(jax.random.key(0))
    params = Checkpointer(model_dir).load_model(template)

    member_params = None
    if member_dirs and swag_samples:
        raise ValueError("pass either member_dirs or swag_samples, not both")
    if member_dirs:
        stacks = [Checkpointer(Path(d)).load_model(template)
                  for d in member_dirs]
        member_params = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs), *stacks)
    elif swag_samples:
        from ..prob import SWAG
        swag = SWAG(params)
        swag.load(model_dir / "model_weights" / "model_swag.npz")
        member_params = swag.sample_members(
            jax.random.key(seed), swag_samples, scale=sampling_scale,
            cov=swag_cov)

    static = data_static.read_stacked() if data_static is not None else None
    timestep_hours = float(
        data_dynamic.timestep / np.timedelta64(1, "h")) if hasattr(
            data_dynamic, "timestep") else None

    export_kwargs = dict(
        input_k=ar_settings["input_k"], output_k=ar_settings["output_k"],
        forecast_cycle=ar_settings["forecast_cycle"],
        batch_size=batch_size, block_size=block_size,
        static=static,
        n_bc_features=data_bc.n_feature if data_bc is not None else 0,
        timestep_hours=timestep_hours,
        feature_order=list(data_dynamic.feature_order),
        platforms=platforms)
    if member_params is not None:
        rollout = export_ensemble_rollout(model, member_params,
                                          **export_kwargs)
    else:
        rollout = export_rollout(model, params, **export_kwargs)

    if out is None:
        out = model_dir / "artifact"
    save_artifact(out, rollout, scaler=scaler, scaler_bc=scaler_bc)
    if verbose:
        size = sum(f.stat().st_size for f in Path(out).iterdir())
        kind = (f"{rollout.meta['n_members']}-member ensemble "
                if member_params is not None else "")
        print(f"exported {model_settings['architecture_name']} {kind}rollout "
              f"(batch {batch_size} x block {block_size}) to {out} "
              f"({size / 1e6:.1f} MB)")
    return Path(out)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--block_size", type=int, default=10)
    p.add_argument("--platforms", nargs="*", default=None)
    p.add_argument("--swag_samples", type=int, default=0)
    p.add_argument("--sampling_scale", type=float, default=0.5)
    p.add_argument("--no_swag_cov", action="store_true")
    p.add_argument("--member_dirs", nargs="*", default=None)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    main(a.model_dir, a.data_dir, out=a.out, batch_size=a.batch_size,
         block_size=a.block_size, platforms=a.platforms,
         swag_samples=a.swag_samples, sampling_scale=a.sampling_scale,
         swag_cov=not a.no_swag_cov, member_dirs=a.member_dirs, seed=a.seed)
