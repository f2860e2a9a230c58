"""Calibrated perturbed-analysis ensemble protocol (VERDICT r4 #8).

Round-4's weight-diversity ensembles (DeepEnsemble, SWAG) were honestly
underdispersive on the toy (spread/skill 0.16-0.26, U-shaped rank
histograms): the toy's long-lead error is dominated by unpredictable
AR(1) innovations that no initial-weight ensemble can represent —
members converge toward the same conditional mean. This protocol
demonstrates the framework's CALIBRATED-ensemble path instead, the way
operational EPS systems are built from a single deterministic model:

  trained HEALPix-16 flagship (scripts/run_healpix64_protocol.py
  --subdivisions 16) ->
  per-member perturbed analyses (smooth IC fields,
  data.toy.perturbation_basis) + stochastic model-error perturbations at
  every AR step (engine/step.py: y = f(x) + eps) ->
  sigmas CALIBRATED from the model's own deterministic error growth
  (random-walk fit: var(L) ~ var_ic + L * var_step, using the committed
  deterministic skill curve + the training scaler — "known error
  growth", nothing tuned on the verification result) ->
  member AR20 rollouts -> CRPS / spread-skill / rank-histogram verify.

Writes docs/benchmarks/healpix{sub}_perturbed_ensemble_protocol.json.
Done criterion: spread/skill ~ 1 at most leads with a near-flat rank
histogram — the probabilistic METRICS validated on an ensemble that is
actually calibrated (ref TODO: verify_DeepEnsemble.py:29-172).

    python scripts/run_perturbed_ensemble_protocol.py [--subdivisions 16]
        [--n_members 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdivisions", type=int, default=16)
    ap.add_argument("--n_members", type=int, default=10)
    ap.add_argument("--ar_iterations_prediction", type=int, default=20)
    ap.add_argument("--n_modes", type=int, default=48)
    ap.add_argument("--mode_length", type=float, default=0.4)
    ap.add_argument("--work_dir", default=None)
    ap.add_argument("--inflate_from_pilot", action="store_true",
                    help="calibrate a per-variable step-noise inflation "
                         "factor from a small pilot ensemble on VALIDATION "
                         "reference times (compensates the trained "
                         "dynamics' contraction of injected noise; the "
                         "test period is never consulted)")
    ap.add_argument("--pilot_members", type=int, default=5)
    ap.add_argument("--pilot_frts", type=int, default=40)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke runs while the TPU "
                         "is busy; the axon plugin ignores JAX_PLATFORMS)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    sub = args.subdivisions
    work = Path(args.work_dir or f"/tmp/hp{sub}_protocol")
    data_dir = work / "data"
    exp_root = work / "exp"
    model_dirs = [p for p in exp_root.iterdir()
                  if (p / "model_weights" / "model.npz").exists()] \
        if exp_root.exists() else []
    if not model_dirs:
        sys.exit(f"no trained model under {exp_root} — run "
                 f"scripts/run_healpix64_protocol.py --subdivisions {sub} "
                 "first")
    model_dir = sorted(model_dirs)[0]
    print(f"perturbed ensemble on {model_dir.name}", flush=True)
    t0 = time.time()

    import jax

    from deepsphere_weather_tpu.config import (get_ar_settings,
                                               get_dataloader_settings,
                                               get_model_settings,
                                               get_training_settings,
                                               read_config_file)
    from deepsphere_weather_tpu.data import (SphericalDataset, StaticDataset,
                                             get_ar_model_tensor_info)
    from deepsphere_weather_tpu.data.toy import perturbation_basis
    from deepsphere_weather_tpu.cli.common import (resolve_scalers,
                                                   split_datasets)
    from deepsphere_weather_tpu.engine import AutoregressivePredictions
    from deepsphere_weather_tpu.engine.loss import AreaWeights
    from deepsphere_weather_tpu.models import get_model
    from deepsphere_weather_tpu.sphere import build_sampling
    from deepsphere_weather_tpu.utils import Checkpointer
    from deepsphere_weather_tpu.verif import (deterministic, global_summary,
                                              probabilistic)
    from deepsphere_weather_tpu.verif.deterministic import SkillDataset
    from run_swag_protocol import _rank_histograms

    cfg = read_config_file(model_dir / "config.json")
    model_settings = get_model_settings(cfg)
    training_settings = get_training_settings(cfg)
    ar_settings = get_ar_settings(cfg)
    dl_settings = get_dataloader_settings(cfg)

    data_dynamic = SphericalDataset.open(
        data_dir / "Data" / "dynamic" / "time_chunked" / "dynamic.zarr")
    bc_path = data_dir / "Data" / "bc" / "time_chunked" / "bc.zarr"
    data_bc = SphericalDataset.open(bc_path) if bc_path.exists() else None
    static_path = data_dir / "Data" / "static.zarr"
    data_static = (StaticDataset.open(static_path)
                   if static_path.exists() else None)
    scaler, scaler_bc = resolve_scalers(dl_settings, data_dir)
    split = split_datasets(training_settings, data_dynamic, data_bc)
    test_dyn, test_bc = split["test"], split["test_bc"]

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
    params = Checkpointer(model_dir).load_model(model.init(jax.random.key(0)))

    # --- sigma calibration from the model's own error growth -------------
    # deterministic skill curve (PHYSICAL units) -> scaled units via the
    # training scaler's std; random-walk error model:
    #   var(L) = var_ic + L * var_step
    # var_ic from the first leadtime, var_step from the mean increment of
    # squared RMSE over the first half of the curve (before saturation).
    det = SkillDataset.load(model_dir / "model_skills"
                            / "deterministic_global_skill.npz")
    feats = list(det.feature_order)
    std = np.asarray(scaler.std, np.float64)         # [F] physical units
    rmse_scaled = np.asarray(det["RMSE"], np.float64) / std[None, :]
    var = rmse_scaled ** 2                            # [L, F]
    Lfit = max(2, var.shape[0] // 2)
    var_step = np.clip(np.diff(var[:Lfit], axis=0).mean(axis=0), 1e-8, None)
    var_ic = np.clip(var[0] - var_step, 1e-8, None)
    ic_sigma = np.sqrt(var_ic).astype(np.float32)
    step_sigma = np.sqrt(var_step).astype(np.float32)
    print(f"calibrated sigmas (scaled units): ic {dict(zip(feats, np.round(ic_sigma, 4)))}, "
          f"step {dict(zip(feats, np.round(step_sigma, 4)))}", flush=True)

    samp = build_sampling(model_settings["sampling"],
                          dict(model_settings["sampling_kwargs"]))
    basis = perturbation_basis(samp, n_modes=args.n_modes,
                               length=args.mode_length, seed=0)

    # --- optional pilot-calibrated step-noise inflation ------------------
    # The trained dynamics CONTRACT injected perturbations toward the
    # conditional mean (the first protocol run measured spread/skill 0.94
    # at +6 h decaying to ~0.44 at +120 h), so uninflated step noise
    # cannot hold long-lead spread. A small pilot ensemble on VALIDATION
    # reference times measures that contraction, and a per-variable
    # inflation factor is solved so the modeled spread recursion matches
    # the random-walk target — operational-EPS inflation calibrated
    # without ever consulting the test period.
    inflation = {f: 1.0 for f in feats}
    contraction = {}
    if args.inflate_from_pilot:
        val_dyn, val_bc = split["val"], split["val_bc"]
        hist = -min(ar_settings["input_k"])
        frt_pool = val_dyn.time[hist + 1: hist + 1 + args.pilot_frts]
        pilots = []
        for m in range(args.pilot_members):
            fc = AutoregressivePredictions(
                model, params,
                data_dynamic=val_dyn, data_bc=val_bc,
                data_static=data_static,
                scaler=scaler, scaler_bc=scaler_bc,
                input_k=ar_settings["input_k"],
                output_k=ar_settings["output_k"],
                forecast_cycle=ar_settings["forecast_cycle"],
                ar_iterations=args.ar_iterations_prediction,
                forecast_reference_times=frt_pool,
                batch_size=training_settings["training_batch_size"],
                zarr_fpath=f"memory://pilot{m}", compressor=None,
                keep_in_memory=True,
                perturbation={"basis": basis, "ic_sigma": ic_sigma,
                              "step_sigma": step_sigma, "seed": 7000 + m})
            pilots.append(fc)
        print(f"pilot ensemble rolled ({time.time() - t0:.0f}s)",
              flush=True)
        L_p = pilots[0].n_leadtime
        for i, f in enumerate(feats):
            stack = np.stack([np.asarray(p.variables[f][...])
                              for p in pilots])          # [M, frt, L, V]
            v_real = (stack.var(axis=0, ddof=1).mean(axis=(0, 2))
                      / std[i] ** 2)                     # [L], scaled
            s2 = float(var_step[i])
            # contraction g^2 from the pilot's own spread recursion
            # v_{L+1} = g^2 v_L + s^2
            num = np.clip(v_real[1:] - s2, 1e-12, None)
            g2 = float(np.clip(np.median(num / np.clip(v_real[:-1],
                                                       1e-12, None)),
                               0.0, 1.0))
            # target: random-walk growth var_ic + (L+1)*var_step, capped
            # at the deterministic error variance (spread cannot usefully
            # exceed skill)
            L_fit = min(L_p, var.shape[0])
            tgt = np.minimum(var_ic[i] + np.arange(1, L_fit + 1) * s2,
                             var[:L_fit, i])
            best_a2, best_err = 1.0, np.inf
            for a in np.arange(1.0, 20.01, 0.05):
                vhat, vh = [], float(var_ic[i])
                for _ in range(L_fit):
                    vh = g2 * vh + (a ** 2) * s2
                    vhat.append(vh)
                err = float(((np.asarray(vhat) - tgt) ** 2).sum())
                if err < best_err:
                    best_a2, best_err = a ** 2, err
            inflation[f] = float(np.sqrt(best_a2))
            contraction[f] = round(g2, 4)
        step_sigma = step_sigma * np.asarray(
            [inflation[f] for f in feats], np.float32)
        print(f"pilot contraction g^2 {contraction}, step-noise inflation "
              f"{ {f: round(v, 2) for f, v in inflation.items()} }",
              flush=True)

    # --- member rollouts -------------------------------------------------
    # Members already on disk (a previous interrupted run) are loaded, not
    # re-rolled — the per-member zarr is the resume point.
    from deepsphere_weather_tpu.engine.prediction import ForecastDataset

    suffix = "_inflated" if args.inflate_from_pilot else ""
    ens_dir = (model_dir / "model_predictions"
               / f"perturbed_ensemble{suffix}")
    members = []
    for m in range(args.n_members):
        mp = ens_dir / f"member{m}.zarr"
        if (Path(mp) / ".zattrs").exists():
            members.append(ForecastDataset.open(mp))
            print(f"member {m} loaded from store ({time.time() - t0:.0f}s)",
                  flush=True)
            continue
        fc = AutoregressivePredictions(
            model, params,
            data_dynamic=test_dyn, data_bc=test_bc, data_static=data_static,
            scaler=scaler, scaler_bc=scaler_bc,
            input_k=ar_settings["input_k"], output_k=ar_settings["output_k"],
            forecast_cycle=ar_settings["forecast_cycle"],
            ar_iterations=args.ar_iterations_prediction,
            batch_size=training_settings["training_batch_size"],
            zarr_fpath=mp,
            keep_in_memory=True,
            perturbation={"basis": basis, "ic_sigma": ic_sigma,
                          "step_sigma": step_sigma, "seed": 9000 + m})
        members.append(fc)
        print(f"member {m} rolled ({time.time() - t0:.0f}s)", flush=True)

    # Assemble the ensemble in an uncompressed memory:// group: the
    # store-backed assembly (zlib, ~11 GB at 10 members) plus the
    # tiny-chunk zlib median store put >50 single-core minutes of pure
    # compression on the verification path of the first attempt.
    from deepsphere_weather_tpu.data.zarrstore import create_group
    from deepsphere_weather_tpu.prob.predictions import (
        EnsembleForecastDataset)

    f0 = members[0]
    M, n_frt, L_fc, V = (len(members), f0.n_frt, f0.n_leadtime,
                         len(f0.lat))
    eg = create_group("memory://perturbed_ensemble",
                      attrs={"feature_order": list(f0.feature_order),
                             "n_member": M}, overwrite=True)
    for name in f0.feature_order:
        arr = eg.create_array(name, shape=(M, n_frt, L_fc, V),
                              chunks=(1, n_frt, L_fc, V), dtype=np.float32,
                              compressor=None)
        for m, fc in enumerate(members):
            arr[m] = np.asarray(fc.variables[name][...])[None]
    for cname in ("forecast_reference_time", "leadtime", "lat", "lon"):
        src = f0.group[cname]
        a = eg.create_array(cname, shape=src.shape, chunks=src.shape,
                            dtype=src.dtype, compressor=None,
                            attrs=src.attrs)
        a[...] = src[...]
    ensemble = EnsembleForecastDataset(eg)
    print(f"ensemble assembled in memory ({time.time() - t0:.0f}s)",
          flush=True)

    # --- verification ----------------------------------------------------
    area_w = np.asarray(AreaWeights(samp))
    pgs = global_summary(probabilistic(ensemble, test_dyn), area_w)
    pgs.save(model_dir / "model_skills"
             / "perturbed_ensemble_probabilistic_global_skill.npz")
    print(f"probabilistic verify done ({time.time() - t0:.0f}s)", flush=True)
    # ensemble-median deterministic skill (the EPS control comparison),
    # computed in memory for the same reason as the assembly above
    mg = create_group("memory://perturbed_median",
                      attrs={"feature_order": list(f0.feature_order)})
    for name in f0.feature_order:
        med = np.median(np.asarray(eg[name][...]), axis=0).astype(np.float32)
        arr = mg.create_array(name, shape=med.shape,
                              chunks=med.shape, dtype=np.float32,
                              compressor=None)
        arr[...] = med
    for cname in ("forecast_reference_time", "leadtime", "lat", "lon"):
        src = f0.group[cname]
        a = mg.create_array(cname, shape=src.shape, chunks=src.shape,
                            dtype=src.dtype, compressor=None,
                            attrs=src.attrs)
        a[...] = src[...]
    median = ForecastDataset(mg)
    gs_med = global_summary(deterministic(median, test_dyn), area_w)
    print(f"median verify done ({time.time() - t0:.0f}s)", flush=True)

    L = min(det["MAE"].shape[0], pgs["CRPS"].shape[0])
    mid, late = L // 2, L - 1
    ranks = _rank_histograms(ensemble, test_dyn, [mid, late])

    result = {
        "config": f"perturbed-analysis ensemble ({args.n_members} members, "
                  f"{args.n_modes} spatial modes len {args.mode_length}) "
                  f"from the single deterministic {model_dir.name}; sigmas "
                  "calibrated from its own deterministic error growth "
                  "(random-walk fit), AR"
                  f"{args.ar_iterations_prediction} member rollouts"
                  + ("; step noise inflated per variable from a "
                     f"{args.pilot_members}-member/{args.pilot_frts}-frt "
                     "pilot on VALIDATION reference times (contraction-"
                     "compensating, test period never consulted)"
                     if args.inflate_from_pilot else ""),
        "wall_s": round(time.time() - t0, 1),
        "calibration": {
            "ic_sigma_scaled": {f: round(float(s), 5)
                                for f, s in zip(feats, ic_sigma)},
            "step_sigma_scaled": {f: round(float(s), 5)
                                  for f, s in zip(feats, step_sigma)},
            "step_inflation": {f: round(float(v), 3)
                               for f, v in inflation.items()},
            "pilot_contraction_g2": contraction,
        },
        "crps_by_leadtime": {
            f: [round(float(x), 4) for x in pgs["CRPS"][:L, i]]
            for i, f in enumerate(feats)},
        "deterministic_mae_by_leadtime": {
            f: [round(float(x), 4) for x in det["MAE"][:L, i]]
            for i, f in enumerate(feats)},
        "crps_over_deterministic_mae": {
            f: [round(float(pgs["CRPS"][lt, i] / det["MAE"][lt, i]), 3)
                for lt in range(L)]
            for i, f in enumerate(feats)},
        "spread_skill_ratio_by_leadtime": {
            f: [round(float(x), 3)
                for x in pgs["spread_skill_ratio"][:L, i]]
            for i, f in enumerate(feats)},
        "ensemble_median_rmse_by_leadtime": {
            f: [round(float(x), 4) for x in gs_med["RMSE"][:L, i]]
            for i, f in enumerate(feats)},
        "single_model_rmse_by_leadtime": {
            f: [round(float(x), 4) for x in det["RMSE"][:L, i]]
            for i, f in enumerate(feats)},
        "rank_histogram": {f"leadtime_{k}": v for k, v in ranks.items()},
        "exp_dir": str(model_dir),
    }
    out_path = (ROOT / "docs" / "benchmarks"
                / f"healpix{sub}_perturbed_ensemble_protocol{suffix}.json")
    out_path.write_text(json.dumps(result, indent=1) + "\n")
    print(f"wrote {out_path}")
    print(json.dumps({k: v for k, v in result.items()
                      if "by_leadtime" not in k and k != "rank_histogram"},
                     indent=1))


if __name__ == "__main__":
    main()
