"""SWAG probabilistic protocol on the trained HEALPix toy flagship.

VERDICT r3 #4: the SWAG/DeepEnsemble machinery was complete and
unit-tested but had no committed ensemble-skill artifact. This script
runs the full reference SWAG flow (finetune_swag.py:354-401 +
modules/swag_predictions.py:16-168) on the experiment produced by
scripts/run_healpix64_protocol.py --subdivisions 16:

  pretrained protocol model -> SWAG moment collection during a short
  high-lr fine-tune -> nb_samples posterior draws -> per-member AR20
  (+120 h) ensemble predictions -> deterministic verify of the median +
  probabilistic verify (CRPS, spread/skill, rank histogram; the
  reference left probabilistic verification as a TODO,
  verify_DeepEnsemble.py).

Writes docs/benchmarks/healpix{sub}_swag_protocol.json with:
- per-leadtime ensemble CRPS vs the deterministic model's MAE
  (CRPS of a perfect deterministic forecast IS its MAE, so CRPS < MAE
  at mid/long leads demonstrates the ensemble adds probabilistic skill)
- spread/skill ratio per leadtime (calibration: ~1 is ideal)
- rank histogram at mid/late leadtimes

    python scripts/run_swag_protocol.py [--subdivisions 16]
        [--nb_samples 5] [--epochs 1]
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


def _rank_histograms(ensemble, obs_dataset, leadtimes):
    """Observation-rank counts [M+1] at chosen leadtime indices."""
    from deepsphere_weather_tpu.verif.probabilistic import rank_histogram

    frt = np.asarray(ensemble.group["forecast_reference_time"][...]).view(
        "datetime64[ns]")
    lt_hours = np.asarray(ensemble.group["leadtime"][...])
    obs_time = obs_dataset.time
    M = ensemble.n_member
    out = {}
    for lt in leadtimes:
        valid = frt + np.round(lt_hours[lt] * 3600.0).astype("timedelta64[s]")
        sidx = np.searchsorted(obs_time, valid)
        ok = sidx < len(obs_time)
        ok &= obs_time[np.minimum(sidx, len(obs_time) - 1)] == valid
        mem = np.stack([
            np.stack([ensemble.variables[n][m, :, lt, :]
                      for n in ensemble.feature_order], axis=-1)[ok]
            for m in range(M)])
        obs = obs_dataset.read_stacked(sidx[ok])
        out[int(lt)] = [int(x) for x in rank_histogram(mem, obs)]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdivisions", type=int, default=16)
    ap.add_argument("--nb_samples", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--sampling_scale", type=float, default=0.1)
    ap.add_argument("--swag_freq", type=int, default=2)
    ap.add_argument("--max_num_models", type=int, default=20)
    ap.add_argument("--ar_iterations_prediction", type=int, default=20)
    ap.add_argument("--target_learning_rate", type=float, default=0.001)
    ap.add_argument("--swa_start", type=int, default=0)
    ap.add_argument("--work_dir", default=None)
    args = ap.parse_args()

    sub = args.subdivisions
    work = Path(args.work_dir or f"/tmp/hp{sub}_protocol")
    data_dir = work / "data"
    exp_root = work / "exp"
    if not exp_root.exists():
        sys.exit(f"no protocol experiment at {exp_root} — run "
                 f"scripts/run_healpix64_protocol.py --subdivisions {sub} "
                 "first")
    model_dirs = [p for p in exp_root.iterdir()
                  if (p / "model_weights" / "model.npz").exists()]
    if not model_dirs:
        sys.exit(f"no trained model under {exp_root}")
    model_dir = sorted(model_dirs)[0]
    print(f"SWAG protocol on {model_dir.name}", flush=True)

    t0 = time.time()
    from deepsphere_weather_tpu.cli.finetune_swag import main as swag_main

    out, gs_median = swag_main(
        model_dir, data_dir, epochs=args.epochs,
        nb_samples=args.nb_samples, sampling_scale=args.sampling_scale,
        swag_freq=args.swag_freq, swa_start=args.swa_start,
        max_num_models=args.max_num_models,
        ar_iterations_prediction=args.ar_iterations_prediction,
        target_learning_rate=args.target_learning_rate, verbose=True)

    # --- assemble the artifact -------------------------------------------
    from deepsphere_weather_tpu.cli.common import split_datasets
    from deepsphere_weather_tpu.config import (get_training_settings,
                                               read_config_file)
    from deepsphere_weather_tpu.data import SphericalDataset
    from deepsphere_weather_tpu.verif.deterministic import SkillDataset

    cfg = read_config_file(model_dir / "config.json")
    data_dynamic = SphericalDataset.open(
        data_dir / "Data" / "dynamic" / "time_chunked" / "dynamic.zarr")
    split = split_datasets(get_training_settings(cfg), data_dynamic, None)
    test_dyn = split["test"]

    det = SkillDataset.load(model_dir / "model_skills"
                            / "deterministic_global_skill.npz")
    prob = SkillDataset.load(model_dir / "model_skills"
                             / "swag_probabilistic_global_skill.npz")
    feats = list(det.feature_order)
    L = min(det["MAE"].shape[0], prob["CRPS"].shape[0])
    mid, late = L // 2, L - 1
    ranks = _rank_histograms(out["ensemble"], test_dyn, [mid, late])

    crps_over_mae = {
        f: [round(float(prob["CRPS"][lt, i] / det["MAE"][lt, i]), 3)
            for lt in range(L)]
        for i, f in enumerate(feats)}
    result = {
        "config": f"SWAG({args.nb_samples} members, scale "
                  f"{args.sampling_scale}, swag_freq {args.swag_freq}, "
                  f"max {args.max_num_models} cov cols) on "
                  f"{model_dir.name}; {args.epochs} fine-tune epoch(s), SWA "
                  f"lr schedule decaying to {args.target_learning_rate} "
                  f"(reference SWAG_settings.target_learning_rate), AR"
                  f"{args.ar_iterations_prediction} (+"
                  f"{args.ar_iterations_prediction * 6} h) member rollouts",
        "wall_s": round(time.time() - t0, 1),
        "crps_by_leadtime": {
            f: [round(float(x), 4) for x in prob["CRPS"][:L, i]]
            for i, f in enumerate(feats)},
        "deterministic_mae_by_leadtime": {
            f: [round(float(x), 4) for x in det["MAE"][:L, i]]
            for i, f in enumerate(feats)},
        "crps_over_deterministic_mae": crps_over_mae,
        "spread_skill_ratio_by_leadtime": {
            f: [round(float(x), 3)
                for x in prob["spread_skill_ratio"][:L, i]]
            for i, f in enumerate(feats)},
        "ensemble_median_rmse_by_leadtime": {
            f: [round(float(x), 4) for x in gs_median["RMSE"][:L, i]]
            for i, f in enumerate(feats)},
        "single_model_rmse_by_leadtime": {
            f: [round(float(x), 4) for x in det["RMSE"][:L, i]]
            for i, f in enumerate(feats)},
        "rank_histogram": {f"leadtime_{k}": v for k, v in ranks.items()},
        "exp_dir": str(model_dir),
    }
    out_path = ROOT / "docs" / "benchmarks" / f"healpix{sub}_swag_protocol.json"
    out_path.write_text(json.dumps(result, indent=1))
    print(f"wrote {out_path}")
    print(json.dumps({k: v for k, v in result.items()
                      if "by_leadtime" not in k and k != "rank_histogram"},
                     indent=1))


if __name__ == "__main__":
    main()
