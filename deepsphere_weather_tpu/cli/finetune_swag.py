"""SWAG fine-tuning + ensemble prediction driver
(reference: scripts_swag/finetune_swag.py:82-640).

Loads a pretrained experiment, wraps its parameters in a SWAG posterior,
continues AR training with periodic moment collection
(swag=True, swag_freq, swa_start — reference finetune_swag.py:354-401),
then runs AutoregressiveSWAGPredictions and verifies the ensemble median.

Usage:
    python -m deepsphere_weather_tpu.cli.finetune_swag \
        --model_dir EXP/<model-name> --data_dir DATA [--nb_samples 10] ...
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def _swag_optimizer(optax, base_lr: float, target_lr: float, swa_start: int,
                    clip: float):
    """Adam with the SWA learning-rate schedule: linear decay base->target
    over the `swa_start` pre-collection updates, constant target after."""
    if swa_start > 0:
        schedule = optax.linear_schedule(
            init_value=base_lr, end_value=target_lr,
            transition_steps=swa_start)
    else:
        schedule = target_lr
    opt = optax.adam(schedule, eps=1e-7)
    if clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(clip), opt)
    return opt


def main(model_dir, data_dir, epochs: int = 1, nb_samples: int = 5,
         sampling_scale: float = 0.1, swag_freq: int = 2, swa_start: int = 0,
         max_num_models: int = 20, ar_iterations_prediction: int = 10,
         target_learning_rate: float = 0.001, verbose: bool = True):
    import jax
    import optax

    from ..utils import enable_compilation_cache
    enable_compilation_cache()

    from ..config import (get_ar_settings, get_dataloader_settings,
                          get_model_settings, get_training_settings,
                          read_config_file)
    from ..data import (SphericalDataset, StaticDataset,
                        get_ar_model_tensor_info)
    from .common import resolve_scalers, split_datasets
    from ..engine import AreaWeights, AutoregressiveTraining
    from ..models import get_model
    from ..prob import SWAG, AutoregressiveSWAGPredictions
    from ..sphere import build_sampling
    from ..utils import Checkpointer
    from ..verif import deterministic, global_summary

    model_dir = Path(model_dir)
    data_dir = Path(data_dir)
    cfg = read_config_file(model_dir / "config.json")
    model_settings = get_model_settings(cfg)
    training_settings = get_training_settings(cfg)
    ar_settings = get_ar_settings(cfg)
    dl_settings = get_dataloader_settings(cfg)
    from ..utils import set_deterministic_training
    set_deterministic_training(
        bool(training_settings.get("deterministic_training", False)),
        seed=int(training_settings.get("seed_model_weights", 0)))

    data_dynamic = SphericalDataset.open(
        data_dir / "Data" / "dynamic" / "time_chunked" / "dynamic.zarr")
    bc_path = data_dir / "Data" / "bc" / "time_chunked" / "bc.zarr"
    data_bc = SphericalDataset.open(bc_path) if bc_path.exists() else None
    static_path = data_dir / "Data" / "static.zarr"
    data_static = (StaticDataset.open(static_path)
                   if static_path.exists() else None)
    # the pretrained model's OWN scaler composition + time split (config
    # written into its exp dir): fine-tuning with a different scaler than
    # training silently corrupts the posterior, and a fractional split
    # could overlap a configured test_period
    scaler, scaler_bc = resolve_scalers(dl_settings, data_dir)

    tensor_info = get_ar_model_tensor_info(ar_settings, data_dynamic,
                                           data_static=data_static,
                                           data_bc=data_bc)
    model_kwargs = {k: v for k, v in model_settings.items()
                    if k != "architecture_name"}
    model_kwargs["pool_method"] = str(model_kwargs["pool_method"]).lower()
    # run at the precision the model was trained with (train_predict
    # plumbs training_settings.numeric_precision the same way; without it
    # a bf16-trained model silently fine-tunes in fp32)
    model_kwargs["numeric_precision"] = training_settings.get(
        "numeric_precision", "float32")
    model = get_model(model_settings["architecture_name"], tensor_info,
                      **model_kwargs)
    template = model.init(jax.random.key(0))
    params = Checkpointer(model_dir).load_model(template)

    # --- SWAG posterior + initial collection (finetune_swag.py:226-231) ---
    swag = SWAG(params, max_num_models=max_num_models)
    swag.collect_model(params)

    split = split_datasets(training_settings, data_dynamic, data_bc)
    samp = build_sampling(model_settings["sampling"],
                          dict(model_settings["sampling_kwargs"]))
    area_w = AreaWeights(samp)

    # resume the pretrained run's AR scheduler so fine-tuning continues
    # with the GROWN AR weights (reference: load_pretrained_ar_scheduler,
    # finetune_swag.py:298-303)
    ar_scheduler = None
    sched_state = Checkpointer(model_dir).load_scheduler_state()
    if sched_state is not None:
        from ..engine import ARScheduler

        ar_scheduler = ARScheduler.from_state_dict(sched_state)
        if verbose:
            print(f"resumed AR scheduler: {ar_scheduler.current_ar_iterations}"
                  f" AR iterations, weights "
                  f"{np.round(ar_scheduler.ar_weights, 3)}")

    # same dp x sp mesh settings as the main trainer (None on 1x1)
    from ..parallel import training_mesh
    mesh = training_mesh(training_settings.get("n_data_parallel", 1),
                         training_settings.get("n_node_parallel", 1))

    params, _, _, info = AutoregressiveTraining(
        model, params,
        mesh=mesh,
        training_data_dynamic=split["train"],
        validation_data_dynamic=split["val"],
        training_data_bc=split["train_bc"],
        validation_data_bc=split["val_bc"],
        data_static=data_static, scaler=scaler, scaler_bc=scaler_bc,
        input_k=ar_settings["input_k"], output_k=ar_settings["output_k"],
        forecast_cycle=ar_settings["forecast_cycle"],
        ar_iterations=ar_settings["ar_iterations"],
        ar_training_strategy=training_settings["ar_training_strategy"],
        area_weights=area_w,
        # SWA lr recipe (reference SWAG_settings.target_learning_rate=0.001,
        # finetune_swag.py:110; Maddox et al. 2019): decay from the
        # pretrained run's lr down to the SWA lr over the pre-collection
        # updates (swa_start), then HOLD at the SWA lr while moments are
        # collected. Collecting at the full training lr (round-4 recipe)
        # bounces members around the loss basin and produced an ensemble
        # 1.34x WORSE than its base model. Clipping still respects the
        # pretrained config — unclipped AR6 BPTT diverges at these lrs.
        optimizer=_swag_optimizer(
            optax,
            base_lr=float(training_settings.get("learning_rate", 0.007)),
            target_lr=float(target_learning_rate),
            swa_start=int(swa_start),
            clip=float(training_settings.get("gradient_clipping", 0.0)
                       or 0.0)),
        epochs=epochs,
        training_batch_size=training_settings["training_batch_size"],
        validation_batch_size=training_settings["validation_batch_size"],
        scoring_interval=training_settings["scoring_interval"],
        validation_batches=training_settings.get("validation_batches"),
        ar_scheduler=ar_scheduler,
        swag=True, swag_model=swag, swag_freq=swag_freq, swa_start=swa_start,
        # fine-tune checkpoints land in their OWN subdirectory: pointing
        # exp_dir at model_dir overwrote the pretrained experiment's
        # model.npz/opt_state/state.json with fine-tuned state, silently
        # destroying the original weights that predict.py would later load
        exp_dir=model_dir / "swag_finetune", num_workers=2, verbose=verbose,
    )
    swag.save(model_dir / "model_weights" / "model_swag.npz")

    # --- ensemble predictions on the test period --------------------------
    test_dyn = split["test"]
    # BatchNorm models re-estimate running stats per sampled member
    # (reference bn_update over the training period, utils_swag.py:58-165)
    bn_update_data = None
    if getattr(model, "has_batch_norm", False):
        bn_update_data = dict(
            data_dynamic=split["train"],
            data_bc=split["train_bc"],
            data_static=data_static, scaler=scaler, scaler_bc=scaler_bc,
            input_k=ar_settings["input_k"], output_k=ar_settings["output_k"],
            forecast_cycle=ar_settings["forecast_cycle"],
            ar_iterations=ar_settings["ar_iterations"],
            batch_size=training_settings["training_batch_size"],
            max_batches=50)
    out = AutoregressiveSWAGPredictions(
        model, swag,
        rng=jax.random.key(0),
        nb_samples=nb_samples, sampling_scale=sampling_scale,
        out_dir=model_dir / "model_predictions" / "swag",
        bn_update_data=bn_update_data,
        data_dynamic=test_dyn,
        data_bc=split["test_bc"],
        data_static=data_static, scaler=scaler, scaler_bc=scaler_bc,
        input_k=ar_settings["input_k"], output_k=ar_settings["output_k"],
        forecast_cycle=ar_settings["forecast_cycle"],
        ar_iterations=ar_iterations_prediction,
        batch_size=training_settings["training_batch_size"],
    )
    # --- deterministic verify of the ensemble median -----------------------
    skill = deterministic(out["median"], test_dyn)
    gs = global_summary(skill, np.asarray(area_w))
    gs.save(model_dir / "model_skills" / "swag_median_global_skill.npz")
    # --- probabilistic verify of the full ensemble (CRPS, spread/skill —
    #     the reference left this as a TODO, verify_DeepEnsemble.py) -------
    from ..verif import probabilistic as prob_verify

    if nb_samples >= 2:
        ps = prob_verify(out["ensemble"], test_dyn)
        pgs = global_summary(ps, np.asarray(area_w))
        pgs.save(model_dir / "model_skills"
                 / "swag_probabilistic_global_skill.npz")
        crps_msg = f"; CRPS at last leadtime: {np.round(pgs['CRPS'][-1], 3)}"
    else:
        crps_msg = " (probabilistic verify skipped: needs >= 2 members)"
    if verbose:
        print(f"SWAG ensemble ({nb_samples} members) verified; "
              f"median RMSE at last leadtime: "
              f"{np.round(gs['RMSE'][-1], 3)}{crps_msg}")
    return out, gs


def cli():
    p = argparse.ArgumentParser(description="SWAG fine-tune + ensemble predict")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--nb_samples", type=int, default=5)
    p.add_argument("--sampling_scale", type=float, default=0.1)
    p.add_argument("--swag_freq", type=int, default=2)
    p.add_argument("--swa_start", type=int, default=0)
    p.add_argument("--max_num_models", type=int, default=20)
    p.add_argument("--target_learning_rate", type=float, default=0.001,
                   help="SWA collection-phase lr (reference "
                        "SWAG_settings.target_learning_rate)")
    p.add_argument("--ar_iterations_prediction", type=int, default=10)
    args = p.parse_args()
    main(args.model_dir, args.data_dir, epochs=args.epochs,
         nb_samples=args.nb_samples, sampling_scale=args.sampling_scale,
         swag_freq=args.swag_freq, swa_start=args.swa_start,
         max_num_models=args.max_num_models,
         target_learning_rate=args.target_learning_rate,
         ar_iterations_prediction=args.ar_iterations_prediction)


if __name__ == "__main__":
    cli()
