"""Root-cause diagnosis: why the HEALPix-64 flagship trained to persistence.

VERDICT r2 #1: the committed healpix64_protocol.json sat within ~0.4-3% of
persistence at every leadtime. Candidate causes: increment-learning ReZero
init (res_increment never leaving ~0), bf16 precision, lr, validation cap.

Key reference fact: the reference protocol does NOT use increment learning —
the driver hard-codes it off (reference:
scripts_training/train_predict_state.py:161 `incremental_learning = False`;
model default False, modules/my_models_graph.py:311). The repo's HP64
protocol script forced increment_learning=True, whose zero-init ReZero gate
makes the model exactly persistence at init.

This script trains short, instrumented HP64 runs (AR1, no growth) for a grid
of {increment_learning, precision, lr} and prints, per scoring interval,
validation loss per AR iteration against the persistence floor computed in
the same scaled space. Decisive output: which variants drop below the floor,
and where res_increment ends up.

    python scripts/diagnose_hp64_learning.py --variant noinc_bf16_lr007
    python scripts/diagnose_hp64_learning.py --all [--years 2 --epochs 6]
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

VARIANTS = {
    # name: (increment_learning, precision, lr)
    "inc_bf16_lr005": (True, "bfloat16", 0.005),     # committed artifact cfg
    "noinc_bf16_lr007": (False, "bfloat16", 0.007),  # reference protocol, bf16
    "noinc_fp32_lr007": (False, "float32", 0.007),   # reference-exact
    "inc_fp32_lr007": (True, "float32", 0.007),      # isolate precision
}


def persistence_floor(val_dyn, scaler, area_w, n_scan, in_k, out_k, fc):
    """Scaled-space area-weighted MSE of persistence for each AR iteration."""
    import jax.numpy as jnp
    from deepsphere_weather_tpu.engine.loss import weighted_mse

    x = val_dyn.read_all()                     # [T, V, F]
    x = scaler.transform(x)
    floors = []
    for i in range(n_scan):
        # iteration i predicts t0 + out_k[0] + i*fc; the last observation
        # sits at t0 + in_k[-1]
        lead = out_k[0] - in_k[-1] + i * fc
        pred = jnp.asarray(x[:-lead] if lead else x)
        true = jnp.asarray(x[lead:])
        floors.append(float(weighted_mse(pred, true, jnp.asarray(area_w))))
    return floors


def run_variant(name, data_dir, years, epochs, batch):
    import jax

    from deepsphere_weather_tpu.cli.common import resolve_scalers
    from deepsphere_weather_tpu.data import SphericalDataset, StaticDataset
    from deepsphere_weather_tpu.data.dataset import (
        train_val_test_split_indices)
    from deepsphere_weather_tpu.engine import (AutoregressiveTraining,
                                               EarlyStopping)
    from deepsphere_weather_tpu.engine.loss import AreaWeights
    from deepsphere_weather_tpu.models import UNetSpherical
    from deepsphere_weather_tpu.data import get_ar_model_tensor_info
    from deepsphere_weather_tpu.sphere import build_sampling
    import optax

    inc, prec, lr = VARIANTS[name]
    in_k, out_k, fc, n_ar = [-3, -2, -1], [0], 1, 1

    dyn = SphericalDataset.open(
        data_dir / "Data" / "dynamic" / "time_chunked" / "dynamic.zarr")
    bc = SphericalDataset.open(
        data_dir / "Data" / "bc" / "time_chunked" / "bc.zarr")
    static = StaticDataset.open(data_dir / "Data" / "static.zarr")
    scaler, scaler_bc = resolve_scalers({}, data_dir, data_dynamic=dyn,
                                        fit_default=True, save_fitted=True)
    i_tr, i_va = train_val_test_split_indices(dyn.n_time)
    train_dyn, val_dyn = dyn.subset(0, i_tr), dyn.subset(i_tr, i_va)
    train_bc, val_bc = bc.subset(0, i_tr), bc.subset(i_tr, i_va)

    ar_settings = {"input_k": in_k, "output_k": out_k, "forecast_cycle": fc,
                   "ar_iterations": n_ar,
                   "stack_most_recent_prediction": True}
    tinfo = get_ar_model_tensor_info(ar_settings, dyn, data_static=static,
                                     data_bc=bc)
    model = UNetSpherical(tinfo, "healpix",
                          {"subdivisions": 64, "nest": True}, knn=20,
                          pool_method="max", increment_learning=inc,
                          numeric_precision=prec)
    params = model.init(jax.random.key(10))
    samp = build_sampling("healpix", {"subdivisions": 64, "nest": True})
    area_w = AreaWeights(samp)

    floors = persistence_floor(val_dyn, scaler, area_w, n_ar + 1,
                               in_k, out_k, fc)
    print(f"[{name}] persistence floor per AR iter (scaled val MSE): "
          f"{[round(f, 5) for f in floors]}  weighted "
          f"{np.mean(floors):.5f}", flush=True)

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
        scoring_interval=25, num_workers=4, verbose=True)
    dt = time.time() - t0

    res_inc = (float(np.asarray(params["res_increment"])[0])
               if "res_increment" in params else None)
    last_per_iter = info.per_iteration_loss[-1] if info.per_iteration_loss else []
    result = {
        "variant": name, "increment_learning": inc, "precision": prec,
        "lr": lr, "wall_s": round(dt, 1),
        "persistence_floor_per_iter": [round(f, 5) for f in floors],
        "final_val_loss": info.validation_total_loss[-1],
        "final_val_per_iter": [round(float(x), 5) for x in last_per_iter],
        "val_vs_floor": [round(float(v) / f, 3)
                         for v, f in zip(last_per_iter, floors)],
        "res_increment": res_inc,
        "val_loss_history": [round(float(v), 5)
                             for v in info.validation_total_loss],
    }
    print(json.dumps(result, indent=1), flush=True)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=sorted(VARIANTS), default=None)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--years", type=float, default=2.0)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--work_dir", default="/tmp/hp64_diag")
    args = ap.parse_args()

    from deepsphere_weather_tpu.data import generate_toy_data

    work = Path(args.work_dir)
    data_dir = work / "data"
    n_steps = int(args.years * 365.25 * 4)
    marker = data_dir / f".toy_{n_steps}"
    if not marker.exists():
        t0 = time.time()
        print(f"generating {n_steps} toy timesteps at HEALPix-64 ...",
              flush=True)
        generate_toy_data(data_dir,
                          sampling_kwargs={"subdivisions": 64, "nest": True},
                          n_timesteps=n_steps, seed=11)
        marker.touch()
        print(f"toy data ready ({time.time() - t0:.0f}s)", flush=True)

    names = sorted(VARIANTS) if args.all else [args.variant or "inc_bf16_lr005"]
    results = [run_variant(n, data_dir, args.years, args.epochs, args.batch)
               for n in names]
    out = work / "diagnosis.json"
    existing = json.loads(out.read_text()) if out.exists() else []
    existing.extend(results)
    out.write_text(json.dumps(existing, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
