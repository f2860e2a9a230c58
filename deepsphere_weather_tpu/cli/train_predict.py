"""Main train + predict + verify driver.

End-to-end parity with the reference driver
(reference: scripts_training/train_predict_state.py:136-632):
config -> open zarr stores -> scalers -> train/val/test time split ->
tensor_info -> model build -> area-weighted loss -> Adam -> AR scheduler +
early stopping -> AutoregressiveTraining -> training plots ->
AutoregressivePredictions (AR=20) -> rechunk -> deterministic verification
+ global summary -> skill plots.

Usage:
    python -m deepsphere_weather_tpu.cli.train_predict \
        --config_file cfg.json --data_dir DATA --exp_dir EXP [--force]

Data directory layout (written by the preprocessing/toy pipeline):
    <data_dir>/Data/dynamic/time_chunked/dynamic.zarr
    <data_dir>/Data/bc/time_chunked/bc.zarr
    <data_dir>/Data/static.zarr
    <data_dir>/Scalers/...
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def _make_optimizer(training_settings):
    """Adam(lr, eps=1e-7) (reference: train_predict_state.py:334) with
    optional global-norm gradient clipping (training_settings
    .gradient_clipping > 0 — RNN-strategy BPTT stabilizer, off by
    default for reference parity). When the lr-decay levers
    (lr_decay_on_growth / lr_plateau_decay) are active, the optimizer is
    wrapped in optax.inject_hyperparams so the training loop can mutate
    the learning rate between steps without recompiling the jitted step
    (engine/training.py::_set_opt_lr). The wrap changes the opt-state
    pytree (hyperparams leaves), so it is applied only when requested —
    plain runs keep checkpoint compatibility."""
    import optax

    clip = float(training_settings.get("gradient_clipping", 0.0) or 0.0)

    def build(learning_rate):
        opt = optax.adam(learning_rate, eps=1e-7)
        if clip > 0:
            opt = optax.chain(optax.clip_by_global_norm(clip), opt)
        return opt

    needs_lr_injection = (
        float(training_settings.get("lr_decay_on_growth", 1.0)) != 1.0
        or float(training_settings.get("lr_plateau_decay", 0.0) or 0.0) > 0)
    if needs_lr_injection:
        return optax.inject_hyperparams(build)(
            learning_rate=float(training_settings["learning_rate"]))
    return build(training_settings["learning_rate"])


def main(cfg_path, data_dir, exp_dir, force: bool = False,
         resume: bool = False,
         ar_iterations_prediction: int = 20, seed_override=None,
         verbose: bool = True):
    import jax

    from ..utils import enable_compilation_cache
    enable_compilation_cache()

    from ..config import (
        create_experiment_directories,
        get_ar_settings,
        get_dataloader_settings,
        get_model_name,
        get_model_settings,
        get_training_settings,
        read_config_file,
        write_config_file,
    )
    from ..data import (
        SphericalDataset,
        StaticDataset,
        get_ar_model_tensor_info,
    )
    from ..engine import (
        ARScheduler,
        AreaWeights,
        AutoregressivePredictions,
        AutoregressiveTraining,
        EarlyStopping,
        rechunk_forecasts_for_verification,
    )
    from ..models import get_model
    from ..sphere import build_sampling
    from ..utils import Checkpointer
    from ..verif import deterministic, global_summary
    from ..plotting import plot_global_skills, plot_skill_maps

    t_start = time.time()
    cfg = read_config_file(cfg_path)
    model_settings = get_model_settings(cfg)
    training_settings = get_training_settings(cfg)
    ar_settings = get_ar_settings(cfg)
    dl_settings = get_dataloader_settings(cfg)
    if seed_override is not None:
        training_settings["seed_model_weights"] = seed_override

    # reference: set_pytorch_settings → deterministic seeding
    # (utils_config.py:444-455)
    from ..utils import set_deterministic_training
    set_deterministic_training(
        bool(training_settings.get("deterministic_training", False)),
        seed=int(training_settings.get("seed_model_weights", 0)))

    data_dir = Path(data_dir)

    # --- open data --------------------------------------------------------
    data_dynamic = SphericalDataset.open(
        data_dir / "Data" / "dynamic" / "time_chunked" / "dynamic.zarr")
    bc_path = data_dir / "Data" / "bc" / "time_chunked" / "bc.zarr"
    data_bc = SphericalDataset.open(bc_path) if bc_path.exists() else None
    static_path = data_dir / "Data" / "static.zarr"
    data_static = (StaticDataset.open(static_path)
                   if static_path.exists() else None)

    # --- scaler -----------------------------------------------------------
    # Config-selected scaler composition (reference SequentialScaler
    # composition in the driver, train_predict_state.py:205-212); default
    # (null) keeps the auto GlobalStandardScaler behavior. Shared with
    # predict/finetune_swag/experiments (cli/common.py) so every driver
    # scales data exactly as training did.
    from .common import build_schedulers, resolve_scalers, split_datasets
    scaler, scaler_bc = resolve_scalers(dl_settings, data_dir,
                                        data_dynamic=data_dynamic,
                                        fit_default=True, save_fitted=True)

    # --- time split: explicit date ranges from config (reference:
    #     1980-2014 / 2015-16 / 2017-18, train_predict_state.py:217-236)
    #     or the fractional 70/15/15 index split when unset ---------------
    split = split_datasets(training_settings, data_dynamic, data_bc)
    train_dyn, val_dyn, test_dyn = split["train"], split["val"], split["test"]
    train_bc, val_bc = split["train_bc"], split["val_bc"]
    (te_lo, te_hi) = split["bounds"][2]

    # --- tensor info + model ---------------------------------------------
    tensor_info = get_ar_model_tensor_info(ar_settings, data_dynamic,
                                           data_static=data_static,
                                           data_bc=data_bc)
    model_kwargs = {k: v for k, v in model_settings.items()
                    if k != "architecture_name"}
    model_kwargs["pool_method"] = str(model_kwargs["pool_method"]).lower()
    model_kwargs["numeric_precision"] = training_settings.get(
        "numeric_precision", "float32")
    model = get_model(model_settings["architecture_name"], tensor_info,
                      **model_kwargs)
    params = model.init(jax.random.key(
        int(training_settings["seed_model_weights"])))
    # fine-tune from a previous experiment's weights
    # (reference: train_predict_state.py:272-274, load_pretrained_model)
    pretrained = model_settings.get("pretrained_model_name")
    if pretrained:
        from ..utils.checkpoint import Checkpointer
        src = Path(exp_dir) / str(pretrained)
        if not (src / "model_weights" / "model.npz").exists():
            raise FileNotFoundError(
                f"pretrained_model_name: no weights at "
                f"{src / 'model_weights' / 'model.npz'}")
        params = Checkpointer(src).load_model(params)
        print(f"loaded pretrained weights from {pretrained}")

    # --- experiment dir ---------------------------------------------------
    model_name = get_model_name(cfg)
    exp_path = create_experiment_directories(exp_dir, model_name,
                                             force=force, resume=resume)
    write_config_file(cfg, exp_path / "config.json")
    (exp_path / "tensor_info.json").write_text(
        json.dumps(tensor_info, indent=1, default=str))

    # --- resume a stopped/crashed run: params + optimizer moments +
    #     grown AR-scheduler state (durability beyond the reference,
    #     which restarts from scratch — SURVEY.md §5.3) -------------------
    initial_opt_state = None
    initial_norm_state = None
    resumed_scheduler = None
    resumed_early_stopping = None
    if resume:
        ck = Checkpointer(exp_path)
        if not ck.has_checkpoint():
            raise FileNotFoundError(
                f"--resume: no checkpoint at "
                f"{exp_path / 'model_weights' / 'model.npz'} — nothing to "
                "resume (use --force for a fresh run)")
        params = ck.load_model(params)
        if getattr(model, "has_batch_norm", False):
            initial_norm_state = ck.load_norm_state(model.init_norm_state())
            if initial_norm_state is None:
                # mirror predict.py: resuming trained BN params with
                # freshly initialized running stats (mean 0 / var 1)
                # silently corrupts eval-mode validation — and with it
                # early stopping and AR-growth decisions — until the
                # momentum-0.1 updates re-converge
                raise FileNotFoundError(
                    f"--resume: batch_norm model but no running stats at "
                    f"{exp_path / 'model_weights' / 'norm_state.npz'} "
                    "(checkpoint predates norm-state saving?). Re-estimate "
                    "them via prob.bn.bn_update, or retrain.")
        sched_state = ck.load_scheduler_state()
        if sched_state is not None:
            from ..engine import ARScheduler, EarlyStopping
            opt_tmpl = _make_optimizer(training_settings).init(params)
            initial_opt_state, _state = ck.load_training_state(opt_tmpl)
            resumed_scheduler = ARScheduler.from_state_dict(sched_state)
            # early-stopping state (best loss, patience counter) is part
            # of the saved training state — a fresh EarlyStopping would
            # forget the plateau and train up to a full extra patience
            # window after the crash
            es_state = _state.get("early_stopping")
            if es_state is not None:
                resumed_early_stopping = EarlyStopping.from_state_dict(
                    es_state)
        if verbose:
            print(f"resuming {model_name} from checkpoint")

    # --- loss / optimizer / schedulers ------------------------------------
    samp = build_sampling(model_settings["sampling"],
                          dict(model_settings["sampling_kwargs"]))
    area_w = AreaWeights(samp)
    optimizer = _make_optimizer(training_settings)
    ar_scheduler0, early_stopping0, lever_kwargs = build_schedulers(
        training_settings, ar_settings)
    ar_scheduler = resumed_scheduler or ar_scheduler0
    early_stopping = resumed_early_stopping or early_stopping0

    # --- training ---------------------------------------------------------
    # dp x sp mesh from the config's mesh settings (None on 1x1: plain jit)
    from ..parallel import training_mesh
    mesh = training_mesh(training_settings.get("n_data_parallel", 1),
                         training_settings.get("n_node_parallel", 1))
    if mesh is not None and verbose:
        print(f"training mesh: {dict(mesh.shape)}")

    params, opt_state, norm_state, info = AutoregressiveTraining(
        model, params,
        training_data_dynamic=train_dyn,
        validation_data_dynamic=val_dyn,
        training_data_bc=train_bc,
        validation_data_bc=val_bc,
        data_static=data_static,
        scaler=scaler, scaler_bc=scaler_bc,
        input_k=ar_settings["input_k"],
        output_k=ar_settings["output_k"],
        forecast_cycle=ar_settings["forecast_cycle"],
        ar_iterations=ar_settings["ar_iterations"],
        stack_most_recent_prediction=ar_settings["stack_most_recent_prediction"],
        ar_training_strategy=training_settings["ar_training_strategy"],
        area_weights=area_w,
        optimizer=optimizer,
        ar_scheduler=ar_scheduler,
        early_stopping=early_stopping,
        **lever_kwargs,
        epochs=training_settings["epochs"],
        training_batch_size=training_settings["training_batch_size"],
        validation_batch_size=training_settings["validation_batch_size"],
        scoring_interval=training_settings["scoring_interval"],
        validation_batches=training_settings.get("validation_batches"),
        save_model_each_epoch=training_settings["save_model_each_epoch"],
        exp_dir=exp_path,
        mesh=mesh,
        remat=bool(training_settings.get("remat", False)),
        num_workers=dl_settings["num_workers"],
        prefetch_factor=dl_settings["prefetch_factor"],
        autotune_num_workers=dl_settings.get("autotune_num_workers", False),
        device_cache=dl_settings.get("device_cache", "auto"),
        initial_opt_state=initial_opt_state,
        initial_norm_state=initial_norm_state,
        shuffle=dl_settings["random_shuffling"],
        shuffle_seed=int(training_settings["seed_random_shuffling"]),
        verbose=verbose,
    )
    info.plots(exp_path)

    # --- prediction on the test period (reference: AR=20 -> +120 h,
    #     train_predict_state.py:484) --------------------------------------
    # BatchNorm models predict in eval mode with the running statistics
    # accumulated DURING training (torch momentum-0.1 semantics, updated
    # inside the jitted step — engine/step.py). The post-hoc bn_update
    # pass (reference utils_swag.py:58-165) remains for SWAG-sampled
    # weights, whose statistics the training run never saw.
    norm_state = norm_state or None
    forecast = AutoregressivePredictions(
        model, params,
        norm_state=norm_state,
        data_dynamic=test_dyn,
        data_bc=data_bc.subset(te_lo, te_hi) if data_bc else None,
        data_static=data_static,
        scaler=scaler, scaler_bc=scaler_bc,
        input_k=ar_settings["input_k"],
        output_k=ar_settings["output_k"],
        forecast_cycle=ar_settings["forecast_cycle"],
        ar_iterations=ar_iterations_prediction,
        batch_size=training_settings["training_batch_size"],
        zarr_fpath=exp_path / "model_predictions" / "forecast_chunked"
        / "test_forecasts.zarr",
        keep_in_memory=True,
        verbose=verbose,
    )
    # The space-chunked copy is still written (exp-dir contract, reference
    # train_predict_state.py:505-510) but straight from the rollout's RAM
    # buffer when it fit — a write-only pass. Verification also reads the
    # RAM buffer directly; at HEALPix-64 the old decompress-read rechunk +
    # store-read verify was 36% of protocol wall (VERDICT r4 #7).
    from ..data.zarrstore import read_bytes_counter
    t_re = time.time()
    b_re = read_bytes_counter()
    forecast_rechunked = rechunk_forecasts_for_verification(
        forecast,
        exp_path / "model_predictions" / "space_chunked"
        / "test_forecasts.zarr")

    # --- verification -----------------------------------------------------
    t_ve = time.time()
    b_ve = read_bytes_counter()
    skill = deterministic(
        forecast if forecast.in_memory else forecast_rechunked, test_dyn)
    skill.save(exp_path / "model_skills" / "deterministic_spatial_skill.npz")
    gs = global_summary(skill, np.asarray(area_w))
    gs.save(exp_path / "model_skills" / "deterministic_global_skill.npz")
    # verify-pass I/O accounting (round-3's HEALPix-64 protocol re-read
    # ~18x the store before the streaming verifier; keep the receipts)
    (exp_path / "model_skills" / "verify_stats.json").write_text(json.dumps({
        "forecast_in_memory": bool(forecast.in_memory),
        "rechunk_wall_s": round(t_ve - t_re, 1),
        "rechunk_read_gb": round((b_ve - b_re) / 1e9, 3),
        "verify_wall_s": round(time.time() - t_ve, 1),
        "verify_read_gb": round((read_bytes_counter() - b_ve) / 1e9, 3),
    }, indent=1))

    # --- plots ------------------------------------------------------------
    plot_global_skills(gs, exp_path / "figs" / "skills")
    plot_skill_maps(skill, exp_path / "figs" / "skills", sampling=samp)

    if verbose:
        rmse_last = gs["RMSE"][-1]
        print(f"[{model_name}] done in {time.time() - t_start:.0f}s; "
              f"final-leadtime RMSE per var: "
              f"{dict(zip(tensor_info['feature_order']['dynamic'], np.round(rmse_last, 3)))}")
    return exp_path, gs


def cli():
    p = argparse.ArgumentParser(description="Train + predict + verify")
    p.add_argument("--config_file", required=True)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--force", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="continue a stopped run from its checkpoint "
                        "(params + optimizer moments + AR scheduler)")
    p.add_argument("--ar_iterations_prediction", type=int, default=20)
    args = p.parse_args()
    main(args.config_file, args.data_dir, args.exp_dir, force=args.force,
         resume=args.resume,
         ar_iterations_prediction=args.ar_iterations_prediction)


if __name__ == "__main__":
    cli()
