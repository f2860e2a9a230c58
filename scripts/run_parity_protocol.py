"""Framework-level parity protocol: torch reference twin vs this framework
(VERDICT r4 missing #3 — the last link between "kernels agree" and
"framework replaces the reference").

docs/PARITY_NUMERIC.md proves step-level equivalence (identical weights,
60 Adam steps). This runs a reduced end-to-end PROTOCOL on identical toy
data (reference driver semantics:
/root/reference/scripts_training/train_predict_state.py:136-632):

  HEALPix-8 advective toy (shared store, shared scaler) ->
  identical-batch training, ~360 updates with AR growth 1 -> 2 ->
  AR10 (+60 h equivalent) predictions over every test reference time,
  each side through its OWN forecast pipeline (JAX:
  AutoregressivePredictions -> zarr -> streaming verification; torch:
  reference-semantics feedback rollout -> same store format -> same
  verification) ->
  paired RMSE-vs-leadtime curves committed to
  docs/benchmarks/parity_protocol.json.

Identical batch sequences are fed to both sides so the comparison
isolates the FRAMEWORKS (loss, BPTT, optimizer, rollout, store,
verification) rather than data-order noise; the torch twin
(scripts/parity_torch.py) re-expresses the reference's exact model and
loss semantics (torch.sparse Chebyshev, MaxPool1d/MaxUnpool1d,
WeightedMSELoss 'mean', RNN-strategy AR feedback).

    python scripts/run_parity_protocol.py [--steps 360] [--batch 8]
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


def write_forecast_store(path, feature_order, frts, leadtime_hours, lat, lon,
                         fields):
    """Write {var: [frt, leadtime, node]} in the engine's forecast-store
    layout so both sides verify through the identical reader."""
    from deepsphere_weather_tpu.data.zarrstore import create_group

    g = create_group(path, overwrite=True,
                     attrs={"feature_order": list(feature_order)})
    n_frt, L = len(frts), len(leadtime_hours)
    V = len(lat)
    for name in feature_order:
        arr = g.create_array(name, shape=(n_frt, L, V),
                             chunks=(n_frt, L, V), dtype=np.float32,
                             compressor="zlib")
        arr[...] = fields[name]
    a = g.create_array("forecast_reference_time", shape=(n_frt,),
                       chunks=(n_frt,), dtype=np.int64, compressor=None)
    a[...] = np.asarray(frts, dtype="datetime64[ns]").view(np.int64)
    a = g.create_array("leadtime", shape=(L,), chunks=(L,),
                       dtype=np.float64, compressor=None,
                       attrs={"units": "hours"})
    a[...] = leadtime_hours
    for cname, cval in (("lat", lat), ("lon", lon)):
        c = g.create_array(cname, shape=(V,), chunks=(V,), dtype=np.float64,
                           compressor=None)
        c[...] = cval
    return path


def torch_rollout(tmodel, indexer, test_dyn, test_bc, static_np, scaler,
                  scaler_bc, t0s, batch_size):
    """Reference-semantics AR feedback rollout (stack_most_recent
    prediction, scaled space, inverse-scaled store values) -> per-variable
    [frt, leadtime, node] arrays."""
    import torch

    n_steps = indexer.ar_iterations + 1
    W = indexer.window_size
    V = test_dyn.n_node
    F = test_dyn.n_feature
    min_k = min(indexer.input_k)
    dt = test_dyn.timestep
    out = {n: np.empty((len(t0s), n_steps, V), np.float32)
           for n in test_dyn.feature_order}
    static_t = torch.from_numpy(np.asarray(static_np, np.float32))
    with torch.no_grad():
        for lo in range(0, len(t0s), batch_size):
            sel = t0s[lo: lo + batch_size]
            B = len(sel)
            buf = np.zeros((B, W, V, F), np.float32)
            bc_win = np.zeros((B, W, V, test_bc.n_feature), np.float32)
            for b, t0 in enumerate(sel):
                t_hist = np.arange(t0 + min_k, t0)
                vals = test_dyn.read_stacked(t_hist)
                buf[b, : len(t_hist)] = scaler.transform(
                    vals, time=test_dyn.time[t_hist]).astype(np.float32)
                t_all = np.arange(t0 + min_k, t0 + min_k + W)
                bc_vals = test_bc.read_stacked(t_all)
                bc_win[b] = scaler_bc.transform(
                    bc_vals, time=test_dyn.time[t0] + (t_all - t0) * dt
                ).astype(np.float32)
            buf_t = torch.from_numpy(buf)
            bc_t = torch.from_numpy(bc_win)
            for i in range(n_steps):
                pin = indexer.input_pos[i]
                pout = indexer.output_pos[i]
                x_dyn = buf_t[:, pin]
                T = x_dyn.shape[1]
                x = torch.cat([
                    static_t.unsqueeze(0).unsqueeze(0).expand(
                        B, T, *static_t.shape),
                    bc_t[:, pin], x_dyn], dim=-1)
                y = tmodel(x)                      # [B, n_out, V, Fd]
                buf_t = buf_t.clone()
                buf_t[:, pout] = y
                y_np = y.numpy()[:, 0]             # single output_k
                t_valid = (test_dyn.time[sel]
                           + (i * indexer.forecast_cycle
                              + indexer.output_k[0]) * dt)
                phys = scaler.inverse_transform(y_np, time=t_valid)
                for f, name in enumerate(test_dyn.feature_order):
                    out[name][lo: lo + B, i] = phys[..., f]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=360,
                    help="total updates (half at AR1, half at AR2)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.002)
    ap.add_argument("--ar_iterations_prediction", type=int, default=10)
    ap.add_argument("--frt_stride", type=int, default=4)
    ap.add_argument("--work_dir", default="/tmp/parity_protocol")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    import torch

    torch.set_num_threads(1)

    from run_parity import build_pair

    from deepsphere_weather_tpu.data import (GlobalStandardScaler,
                                             generate_toy_data)
    from deepsphere_weather_tpu.data.ar import ARIndexer
    from deepsphere_weather_tpu.data.dataset import (
        SphericalDataset, StaticDataset, train_val_test_split_indices)
    from deepsphere_weather_tpu.data.loader import (AutoregressiveDataLoader,
                                                    AutoregressiveDataset)
    from deepsphere_weather_tpu.engine import (AutoregressivePredictions,
                                               ForecastDataset)
    from deepsphere_weather_tpu.engine.step import (make_context,
                                                    make_train_step)
    from deepsphere_weather_tpu.verif import deterministic, global_summary
    from parity_torch import ar_loss_torch

    t_start = time.time()
    work = Path(args.work_dir)
    data_dir = work / "data"
    n_timesteps = 2200
    if not (data_dir / "Data" / "static.zarr").exists():
        print(f"generating {n_timesteps} toy timesteps at HEALPix-8 ...",
              flush=True)
        generate_toy_data(data_dir,
                          sampling_kwargs={"subdivisions": 8, "nest": True},
                          n_timesteps=n_timesteps, seed=11)
    dyn = SphericalDataset.open(
        data_dir / "Data" / "dynamic" / "time_chunked" / "dynamic.zarr")
    bc = SphericalDataset.open(
        data_dir / "Data" / "bc" / "time_chunked" / "bc.zarr")
    i_train, i_val = train_val_test_split_indices(dyn.n_time)
    train_dyn, train_bc = dyn.subset(0, i_train), bc.subset(0, i_train)
    test_dyn, test_bc = dyn.subset(i_val, dyn.n_time), bc.subset(
        i_val, bc.n_time)
    scaler = GlobalStandardScaler().fit_dataset(train_dyn)
    scaler_bc = GlobalStandardScaler().fit_dataset(train_bc)

    # --- identical-weight pair (JAX model + torch twin) -----------------
    pair = build_pair(8, 20, args.batch, ar_iters=2)
    model, tmodel = pair["model"], pair["tmodel"]
    indexer, area_w = pair["indexer"], pair["area_w"]
    static_ds = StaticDataset.open(data_dir / "Data" / "static.zarr")
    static_np = np.asarray(static_ds.read_stacked(), np.float32)
    print(f"pair built ({time.time() - t_start:.0f}s)", flush=True)

    # --- identical-batch training with AR growth 1 -> 2 -----------------
    dataset = AutoregressiveDataset(train_dyn, indexer, data_bc=train_bc,
                                    data_static=static_ds,
                                    scaler=scaler, scaler_bc=scaler_bc)
    params = jax.device_put(pair["params"])
    optimizer = optax.adam(args.lr, eps=1e-7)
    opt_state = optimizer.init(params)
    ctx = make_context(model, jnp.asarray(area_w))
    steps_jit = {
        1: jax.jit(make_train_step(model, indexer, optimizer, 1, "RNN")),
        2: jax.jit(make_train_step(model, indexer, optimizer, 2, "RNN")),
    }
    topt = torch.optim.Adam(tmodel.parameters(), lr=args.lr, eps=1e-7)
    area_t = torch.from_numpy(np.asarray(area_w))
    static_t = torch.from_numpy(np.asarray(static_np, np.float32))

    half = args.steps // 2
    jl, tl = [], []
    step = 0
    epoch = 0
    t_tr = time.time()
    while step < args.steps:
        loader = AutoregressiveDataLoader(
            dataset, batch_size=args.batch, shuffle=True, shuffle_seed=7,
            drop_last_batch=True, num_workers=1, epoch=epoch)
        for batch in loader:
            if step >= args.steps:
                break
            n_scan = 1 if step < half else 2
            w_np = np.ones(n_scan, np.float32) / n_scan
            batch_np = {"dynamic": np.asarray(batch["dynamic"]),
                        "bc": np.asarray(batch["bc"]),
                        "static": np.asarray(static_np, np.float32)}
            bj = {k: jnp.asarray(v) for k, v in batch_np.items()}
            params, opt_state, total, _ = steps_jit[n_scan](
                params, opt_state, bj, jnp.asarray(w_np), ctx)
            jl.append(float(total))

            bt = {"dynamic": torch.from_numpy(batch_np["dynamic"]),
                  "bc": torch.from_numpy(batch_np["bc"]),
                  "static": static_t}
            topt.zero_grad()
            tt, _ = ar_loss_torch(tmodel, bt, indexer, n_scan,
                                  torch.from_numpy(w_np), area_t)
            tt.backward()
            topt.step()
            tl.append(float(tt.detach()))
            step += 1
            if step % 40 == 0:
                print(f"step {step}/{args.steps} (AR{n_scan}) "
                      f"jax {jl[-1]:.5f} torch {tl[-1]:.5f} "
                      f"({(time.time() - t_tr) / step:.2f} s/step)",
                      flush=True)
        epoch += 1
    jl, tl = np.asarray(jl), np.asarray(tl)
    tr_diff = np.abs(jl - tl) / np.maximum(np.abs(tl), 1e-12)
    print(f"training done: max per-step loss rel diff {tr_diff.max():.2e}",
          flush=True)

    # --- AR10 predictions through each side's own pipeline --------------
    pred_ix = ARIndexer.build([-3, -2, -1], [0], 1,
                              args.ar_iterations_prediction)
    # full-horizon-valid reference times only: both sides then read BC
    # from the store without hold-last extrapolation
    pos = pred_ix.valid_reference_positions(test_dyn.n_time)
    t0s = pos[:: args.frt_stride]
    frts = test_dyn.time[t0s]
    exp = work / "exp"

    t_p = time.time()
    fc_jax = AutoregressivePredictions(
        model, params,
        data_dynamic=test_dyn, data_bc=test_bc,
        data_static=static_ds, scaler=scaler, scaler_bc=scaler_bc,
        input_k=[-3, -2, -1], output_k=[0], forecast_cycle=1,
        ar_iterations=args.ar_iterations_prediction,
        forecast_reference_times=frts, batch_size=args.batch,
        zarr_fpath=exp / "jax_forecast.zarr")
    print(f"jax predictions ({time.time() - t_p:.0f}s)", flush=True)

    t_p = time.time()
    torch_fields = torch_rollout(
        tmodel, pred_ix, test_dyn, test_bc, static_np, scaler, scaler_bc,
        t0s, args.batch)
    fc_torch = ForecastDataset.open(write_forecast_store(
        exp / "torch_forecast.zarr", test_dyn.feature_order, frts,
        fc_jax.leadtime_hours, test_dyn.lat, test_dyn.lon, torch_fields))
    print(f"torch predictions ({time.time() - t_p:.0f}s)", flush=True)

    # --- identical verification for both -------------------------------
    gs = {}
    for tag, fc in (("jax", fc_jax), ("torch", fc_torch)):
        skill = deterministic(fc, test_dyn)
        gs[tag] = global_summary(skill, np.asarray(area_w))
    feats = list(test_dyn.feature_order)
    L = len(fc_jax.leadtime_hours)
    curve = {
        tag: {f: [round(float(gs[tag]["RMSE"][lt, i]), 4)
                  for lt in range(L)]
              for i, f in enumerate(feats)}
        for tag in ("jax", "torch")}
    rel = {f: [round(abs(float(gs["jax"]["RMSE"][lt, i])
                         - float(gs["torch"]["RMSE"][lt, i]))
               / max(float(gs["torch"]["RMSE"][lt, i]), 1e-12), 6)
               for lt in range(L)] for i, f in enumerate(feats)}
    max_rel = max(max(v) for v in rel.values())

    # direct field agreement at first/mid/last leadtime
    field_rel = {}
    for lt in (0, L // 2, L - 1):
        num = den = 0.0
        for name in feats:
            a = fc_jax.variables[name][:, lt, :]
            b = fc_torch.variables[name][:, lt, :]
            num += float(np.abs(a - b).max())
            den += float(np.abs(b).max())
        field_rel[f"leadtime_{lt}"] = round(num / den, 6)

    result = {
        "config": f"HEALPix-8 toy protocol, {args.steps} identical-batch "
                  f"updates (AR growth 1->2 at step {half}), lr {args.lr} "
                  f"Adam eps 1e-7 fp32 CPU, AR{args.ar_iterations_prediction}"
                  f" predictions over {len(t0s)} test reference times, "
                  "both sides verified by the same streaming verifier",
        "wall_s": round(time.time() - t_start, 1),
        "train_loss_max_rel_diff": round(float(tr_diff.max()), 6),
        "final_losses": {"jax": round(float(jl[-1]), 6),
                         "torch": round(float(tl[-1]), 6)},
        "rmse_by_leadtime": curve,
        "rmse_rel_diff_by_leadtime": rel,
        "rmse_max_rel_diff": round(float(max_rel), 6),
        "forecast_field_max_rel_diff": field_rel,
    }
    out_path = ROOT / "docs" / "benchmarks" / "parity_protocol.json"
    out_path.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps({k: v for k, v in result.items()
                      if "by_leadtime" not in k}, indent=1))
    print(f"wrote {out_path}")
    ok = max_rel < 0.03
    print("PARITY PROTOCOL:", "OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
