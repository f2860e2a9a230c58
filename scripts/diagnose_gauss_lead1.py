"""Root-cause diagnosis: why O24 Gauss-Legendre one-step skill trails siblings.

Round-5 context: the mesh-Laplacian protocol re-run removed the knn
polar-bias drift (max ratio 0.87 -> 0.78) but LEAD-1 skill is still far
from the quasi-uniform samplings (t850 0.756 / z500 0.657 vs ~0.45-0.51
on cubed/icosahedral — docs/benchmarks/sampling_protocols.json), and the
deficit predates the operator switch (the round-4 knn run shows 0.705 /
0.576). The toy process is sampling-independent (generated on a regular
lat/lon grid and bilinearly sampled, data/toy.py::_advected_synoptic),
so the gap is in the operator/model, not the data.

This trains short AR1-only runs on the SAME on-disk O24 toy data for a
grid of {graph_type, kernel_size_conv} and prints final validation MSE
against the persistence floor computed in the same scaled space, plus a
cubed-sphere control at identical budget so "good" is measured, not
remembered. CPU-runnable (fp32) so it can execute while the TPU is busy
with protocol runs; conclusions are relative.

    python scripts/diagnose_gauss_lead1.py --data_dir /tmp/gauss_protocol/data \
        [--variant mesh_k3] [--years 2] [--epochs 2]

Reference facts: kernel_size_conv=3 is the reference default
(modules/utils_config.py:46); the reference ships Graph_knn and
Graph_mesh config families for every sampling (configs/UNetSpherical/).
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

# name: (graph_type, kernel_size_conv)
VARIANTS = {
    "mesh_k3": ("mesh", 3),       # round-5 protocol choice
    "mesh_k5": ("mesh", 5),       # wider spectral support on the cotan op
    "knn_k3": ("knn", 3),         # round-4 protocol choice
    "knn_k5": ("knn", 5),
    "voronoi_k3": ("voronoi", 3),  # mass-lumped M^-1 L (reference models.py:49-60)
}

STEPS_6H = 4 * 365  # timesteps per toy-year


def persistence_floor(val_dyn, scaler, area_w, n_scan, in_k, out_k, fc):
    import jax.numpy as jnp

    from deepsphere_weather_tpu.engine.loss import weighted_mse

    x = scaler.transform(val_dyn.read_all())
    floors = []
    for i in range(n_scan):
        lead = out_k[0] - in_k[-1] + i * fc
        pred = jnp.asarray(x[:-lead] if lead else x)
        true = jnp.asarray(x[lead:])
        floors.append(float(weighted_mse(pred, true, jnp.asarray(area_w))))
    return floors


def run_variant(name, sampling, sampling_kwargs, data_dir, years, epochs,
                batch, lr):
    import jax
    import optax

    from deepsphere_weather_tpu.cli.common import resolve_scalers
    from deepsphere_weather_tpu.data import (SphericalDataset, StaticDataset,
                                             get_ar_model_tensor_info)
    from deepsphere_weather_tpu.engine import (AutoregressiveTraining,
                                               EarlyStopping)
    from deepsphere_weather_tpu.engine.loss import AreaWeights
    from deepsphere_weather_tpu.models import UNetSpherical
    from deepsphere_weather_tpu.sphere import build_sampling

    graph_type, ksize = VARIANTS[name] if name in VARIANTS else ("knn", 3)
    in_k, out_k, fc, n_ar = [-3, -2, -1], [0], 1, 1

    dyn = SphericalDataset.open(
        data_dir / "Data" / "dynamic" / "time_chunked" / "dynamic.zarr")
    bc = SphericalDataset.open(
        data_dir / "Data" / "bc" / "time_chunked" / "bc.zarr")
    static = StaticDataset.open(data_dir / "Data" / "static.zarr")
    n_keep = min(dyn.n_time, int(years * STEPS_6H))
    scaler, scaler_bc = resolve_scalers({}, data_dir, data_dynamic=dyn,
                                        fit_default=True, save_fitted=False)
    i_tr = int(n_keep * 0.7)
    i_va = int(n_keep * 0.85)
    train_dyn, val_dyn = dyn.subset(0, i_tr), dyn.subset(i_tr, i_va)
    train_bc, val_bc = bc.subset(0, i_tr), bc.subset(i_tr, i_va)

    ar_settings = {"input_k": in_k, "output_k": out_k, "forecast_cycle": fc,
                   "ar_iterations": n_ar,
                   "stack_most_recent_prediction": True}
    tinfo = get_ar_model_tensor_info(ar_settings, dyn, data_static=static,
                                     data_bc=bc)
    model = UNetSpherical(tinfo, sampling, dict(sampling_kwargs), knn=20,
                          graph_type=graph_type, kernel_size_conv=ksize,
                          pool_method="interp",
                          numeric_precision="float32")
    params = model.init(jax.random.key(10))
    samp = build_sampling(sampling, dict(sampling_kwargs))
    area_w = AreaWeights(samp)

    floors = persistence_floor(val_dyn, scaler, area_w, n_ar + 1,
                               in_k, out_k, fc)
    print(f"[{name} @ {sampling}] persistence floor (scaled val MSE/iter): "
          f"{[round(f, 5) for f in floors]}", flush=True)

    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adam(lr, eps=1e-7))
    t0 = time.time()
    params, _, _, info = AutoregressiveTraining(
        model, params,
        training_data_dynamic=train_dyn, validation_data_dynamic=val_dyn,
        training_data_bc=train_bc, validation_data_bc=val_bc,
        data_static=static, scaler=scaler, scaler_bc=scaler_bc,
        input_k=in_k, output_k=out_k, forecast_cycle=fc, ar_iterations=n_ar,
        ar_training_strategy="RNN", area_weights=area_w, optimizer=opt,
        early_stopping=EarlyStopping(patience=10_000),
        epochs=epochs, training_batch_size=batch, validation_batch_size=batch,
        scoring_interval=25, num_workers=2, verbose=True)
    dt = time.time() - t0

    last_per_iter = (info.per_iteration_loss[-1]
                     if info.per_iteration_loss else [])
    result = {
        "variant": name, "sampling": sampling, "graph_type": graph_type,
        "kernel_size_conv": ksize, "wall_s": round(dt, 1),
        "persistence_floor_per_iter": [round(f, 5) for f in floors],
        "final_val_loss": info.validation_total_loss[-1],
        "final_val_per_iter": [round(float(x), 5) for x in last_per_iter],
        "val_vs_floor": [round(float(v) / f, 3)
                         for v, f in zip(last_per_iter, floors)],
        "val_loss_history": [round(float(v), 5)
                             for v in info.validation_total_loss],
    }
    print(json.dumps(result, indent=1), flush=True)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/tmp/gauss_protocol/data")
    ap.add_argument("--cubed_data_dir", default="/tmp/gauss_diag_cubed")
    ap.add_argument("--variant", action="append", default=None,
                    help="subset of variants (default: all + cubed control)")
    ap.add_argument("--years", type=float, default=2.0)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=0.007)
    ap.add_argument("--cpu", action="store_true", default=True)
    ap.add_argument("--tpu", dest="cpu", action="store_false")
    ap.add_argument("--out", default="/tmp/gauss_lead1_diag.json")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    gauss_kwargs = {"nlat": 48, "nlon": "ecmwf-octahedral"}
    results = []
    names = args.variant or list(VARIANTS) + ["cubed_control"]
    for name in names:
        if name == "cubed_control":
            cdir = Path(args.cubed_data_dir)
            if not (cdir / "Data" / "static.zarr").exists():
                from deepsphere_weather_tpu.data import generate_toy_data

                print("generating cubed control toy data ...", flush=True)
                generate_toy_data(
                    cdir, sampling="cubed",
                    sampling_kwargs={"subdivisions": 24},
                    n_timesteps=int(args.years * STEPS_6H) + 8, seed=0)
            results.append(run_variant(
                "knn_k3_cubed", "cubed", {"subdivisions": 24}, cdir,
                args.years, args.epochs, args.batch, args.lr))
        else:
            results.append(run_variant(
                name, "gauss", gauss_kwargs, Path(args.data_dir),
                args.years, args.epochs, args.batch, args.lr))
        Path(args.out).write_text(json.dumps(results, indent=1) + "\n")
    print("\nsummary (val/floor at AR iter 0..1):")
    for r in results:
        print(f"  {r['variant']:>14} @ {r['sampling']:<6} "
              f"{r['val_vs_floor']}")


if __name__ == "__main__":
    main()
