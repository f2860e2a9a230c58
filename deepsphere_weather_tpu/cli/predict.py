"""Standalone prediction driver (reference: scripts_training/predict_state.py).

Loads a trained experiment directory (config.json + tensor_info.json +
model.npz), revalidates the tensor layout against the current data
(check_same_dict guard, reference predict_state.py:162), and runs long
AR rollouts from explicit forecast_reference_times with ar_blocks-chunked
zarr streaming (reference defaults ar_iterations=500, ar_blocks=1000,
predict_state.py:223-224).

Usage:
    python -m deepsphere_weather_tpu.cli.predict \
        --model_dir EXP/<model-name> --data_dir DATA \
        --forecast_reference_times 2010-11-01T00:00 2010-11-02T00:00 \
        [--ar_iterations 500] [--ar_blocks 1000]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(model_dir, data_dir, forecast_reference_times=None,
         ar_iterations: int = 500, ar_blocks: int = 1000,
         out_path=None, batch_size: int = 16, rounding=None,
         bc_generator=None, verbose: bool = True):
    """`bc_generator`: callable(times)->[T,V,F_bc] for boundary conditions
    beyond the BC store (rollouts longer than the dataset), or the string
    'toa' for analytic top-of-atmosphere solar radiation."""
    import jax

    from ..utils import enable_compilation_cache
    enable_compilation_cache()

    from ..config import (check_same_dict, get_ar_settings,
                          get_dataloader_settings, get_model_settings,
                          get_training_settings, read_config_file)
    from ..data import (SphericalDataset, StaticDataset,
                        get_ar_model_tensor_info)
    from .common import resolve_scalers
    from ..engine import AutoregressivePredictions
    from ..models import get_model
    from ..utils import Checkpointer

    model_dir = Path(model_dir)
    data_dir = Path(data_dir)
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
    # the trained model's OWN scaler composition (from its config.json):
    # predicting with a different scaler than training silently produces
    # garbage in physical units
    scaler, scaler_bc = resolve_scalers(get_dataloader_settings(cfg),
                                        data_dir)

    # tensor-layout guard (reference predict_state.py:162)
    tensor_info = get_ar_model_tensor_info(ar_settings, data_dynamic,
                                           data_static=data_static,
                                           data_bc=data_bc)
    saved_info_path = model_dir / "tensor_info.json"
    if saved_info_path.exists():
        saved = json.loads(saved_info_path.read_text())
        check_same_dict(
            json.loads(json.dumps(tensor_info, default=str)), saved)

    model_kwargs = {k: v for k, v in model_settings.items()
                    if k != "architecture_name"}
    model_kwargs["pool_method"] = str(model_kwargs["pool_method"]).lower()
    # run at the precision the model was trained with (train_predict
    # plumbs training_settings.numeric_precision the same way; without it
    # a bf16-trained model silently predicts in fp32)
    model_kwargs["numeric_precision"] = get_training_settings(cfg).get(
        "numeric_precision", "float32")
    model = get_model(model_settings["architecture_name"], tensor_info,
                      **model_kwargs)
    template = model.init(jax.random.key(0))
    ck = Checkpointer(model_dir)
    params = ck.load_model(template)
    # BatchNorm models: eval-mode prediction needs the running statistics
    # checkpointed by training (norm_state.npz)
    norm_state = None
    if getattr(model, "has_batch_norm", False):
        norm_state = ck.load_norm_state(model.init_norm_state())
        if norm_state is None:
            raise FileNotFoundError(
                f"{model_dir}: batch_norm model has no "
                "model_weights/norm_state.npz — retrain or run "
                "prob.bn.bn_update to produce running statistics")

    if forecast_reference_times is not None:
        forecast_reference_times = np.asarray(
            forecast_reference_times, dtype="datetime64[ns]")
    if out_path is None:
        out_path = (model_dir / "model_predictions" / "forecast_chunked"
                    / "long_forecasts.zarr")

    if bc_generator == "toa":
        from ..data.toy import toa_solar_radiation
        lat, lon = data_dynamic.lat, data_dynamic.lon

        def bc_generator(times):  # [T] -> [T, V, 1]
            return toa_solar_radiation(times, lat, lon)[..., None]

    forecast = AutoregressivePredictions(
        model, params,
        norm_state=norm_state,
        data_dynamic=data_dynamic, data_bc=data_bc,
        bc_generator=bc_generator, data_static=data_static,
        scaler=scaler, scaler_bc=scaler_bc,
        input_k=ar_settings["input_k"], output_k=ar_settings["output_k"],
        forecast_cycle=ar_settings["forecast_cycle"],
        ar_iterations=ar_iterations, ar_blocks=ar_blocks,
        forecast_reference_times=forecast_reference_times,
        batch_size=batch_size, rounding=rounding,
        zarr_fpath=out_path, verbose=verbose,
    )
    if verbose:
        print(f"forecasts written to {out_path} "
              f"({forecast.n_frt} reference times x "
              f"{forecast.n_leadtime} leadtimes)")
    return forecast


def cli():
    p = argparse.ArgumentParser(description="Long AR rollout prediction")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--forecast_reference_times", nargs="*", default=None)
    p.add_argument("--ar_iterations", type=int, default=500)
    p.add_argument("--ar_blocks", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--out_path", default=None)
    p.add_argument("--bc_generator", default=None, choices=[None, "toa"],
                   help="analytic BC source for rollouts beyond the BC store")
    args = p.parse_args()
    main(args.model_dir, args.data_dir,
         forecast_reference_times=args.forecast_reference_times,
         ar_iterations=args.ar_iterations, ar_blocks=args.ar_blocks,
         batch_size=args.batch_size, out_path=args.out_path,
         bc_generator=args.bc_generator)


if __name__ == "__main__":
    cli()
