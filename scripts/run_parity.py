"""Run the full numerical-parity suite vs the torch reference twin and
regenerate docs/PARITY_NUMERIC.md.

    python scripts/run_parity.py [--subdivisions 8] [--train-steps 60]

Stages (see scripts/parity_torch.py for the torch twin):
  1. per-block forward max-abs-diff at IDENTICAL weights
  2. full-model forward / AR-loss agreement
  3. gradient agreement for every parameter tensor
  4. same-batch training: overlaid loss trajectories (Adam, eps=1e-7)
  5. post-training AR rollout: per-leadtime RMSE curves from each side's
     own trained weights

All CPU, fp32 both sides (the reference stack runs fp32; this environment
has no NVIDIA GPU). Writes the committed report docs/PARITY_NUMERIC.md.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def rel_diff(a, b) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = max(np.abs(a).max(), 1e-30)
    return float(np.abs(a - b).max() / scale)


def build_pair(subdiv: int, knn: int, batch: int, ar_iters: int, seed: int = 0,
               batch_norm: bool = False):
    """Identical-weight (JAX model, torch twin) pair + shared fixtures."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    from deepsphere_weather_tpu.data.ar import ARIndexer
    from deepsphere_weather_tpu.engine.loss import AreaWeights
    from deepsphere_weather_tpu.models import UNetSpherical
    from deepsphere_weather_tpu.sphere import build_sampling
    from parity_torch import (TorchUNetSpherical, load_params_into_torch,
                              torch_laplacians)

    torch.manual_seed(0)
    n_node = 12 * subdiv ** 2
    in_feat, out_feat, in_time = 7, 2, 3
    tensor_info = {
        "input_n_feature": in_feat, "output_n_feature": out_feat,
        "input_n_time": in_time, "output_n_time": 1,
        "input_shape_info": {"dynamic": {"node": n_node}},
        "output_shape_info": {"dynamic": {"node": n_node}},
        "dim_order": {"dynamic": ["sample", "time", "node", "feature"]},
    }
    model = UNetSpherical(
        tensor_info=tensor_info, sampling="healpix",
        sampling_kwargs={"subdivisions": subdiv, "nest": True},
        knn=knn, pool_method="max", increment_learning=True,
        batch_norm=batch_norm,
        numeric_precision="float32", use_pallas=False,
        dense_threshold=10 ** 9)          # dense everywhere: bit-stable CPU
    params = model.init(jax.random.key(seed))

    laps = torch_laplacians({"subdivisions": subdiv, "nest": True}, knn)
    tmodel = TorchUNetSpherical(laps, in_feat * in_time,
                                out_feat, out_feat,
                                increment_learning=True,
                                batch_norm=batch_norm)
    load_params_into_torch(tmodel, params)

    indexer = ARIndexer.build([-3, -2, -1], [0], 1, ar_iters)
    samp = build_sampling("healpix", {"subdivisions": subdiv, "nest": True})
    area_w = np.asarray(AreaWeights(samp))

    rng = np.random.default_rng(seed)
    W = indexer.window_size
    batch_np = {
        "dynamic": rng.standard_normal(
            (batch, W, n_node, out_feat)).astype(np.float32),
        "bc": rng.standard_normal(
            (batch, W, n_node, 1)).astype(np.float32),
        "static": rng.standard_normal(
            (n_node, in_feat - out_feat - 1)).astype(np.float32),
    }
    return dict(model=model, params=params, tmodel=tmodel, laps=laps,
                indexer=indexer, area_w=area_w, batch=batch_np,
                tensor_info=tensor_info, n_node=n_node,
                in_feat=in_feat, out_feat=out_feat, in_time=in_time)


def forward_block_diffs(pair) -> dict:
    """Per-block forward max-rel-diff at identical weights."""
    import jax.numpy as jnp
    import torch

    from parity_torch import healpix_max_pool, healpix_max_unpool

    model, params, tmodel = pair["model"], pair["params"], pair["tmodel"]
    b = pair["batch"]
    x_np = np.concatenate([
        np.broadcast_to(b["static"][None, None],
                        b["dynamic"].shape[:2] + b["static"].shape),
        b["bc"], b["dynamic"]], axis=-1)[:, :3]           # [B, T_in, V, F_in]
    xj = jnp.asarray(x_np)
    xt = torch.from_numpy(x_np)

    diffs = {}
    with torch.no_grad():
        # encoder
        geom = model.geometry_pytree()
        ops, pools, unpools = (geom["cheb_ops"], geom["pools"],
                               geom["unpools"])
        B, T, V, F = x_np.shape
        hj = jnp.transpose(xj, (0, 2, 1, 3)).reshape(B, V, T * F)
        ht = xt.permute(0, 2, 1, 3).reshape(B, V, T * F)

        e1j = model.conv1.apply(params["conv1"], hj, cheb_op=ops[0])
        e1t = tmodel.conv1(tmodel.laps[0], ht)
        diffs["conv1 (ResBlock enc L0)"] = rel_diff(e1j, e1t)

        p1j, i1j = pools[0](e1j)
        p1t, i1t = healpix_max_pool(e1t)
        e2j = model.conv2.apply(params["conv2"], p1j, cheb_op=ops[1])
        e2t = tmodel.conv2(tmodel.laps[1], p1t)
        diffs["conv2 (ResBlock enc L1)"] = rel_diff(e2j, e2t)

        p2j, i2j = pools[1](e2j)
        p2t, i2t = healpix_max_pool(e2t)
        e3j = model.conv3.apply(params["conv3"], p2j, cheb_op=ops[2])
        e3t = tmodel.conv3(tmodel.laps[2], p2t)
        diffs["conv3 (ResBlock enc L2)"] = rel_diff(e3j, e3t)

        dj = unpools[1](e3j, i2j)
        dt = healpix_max_unpool(e3t, i2t)
        diffs["unpool L1 (max indices)"] = rel_diff(dj, dt)
        dj = model.uconv2.apply(params["uconv2"],
                                jnp.concatenate([dj, e2j], axis=2),
                                cheb_op=ops[1])
        dt = tmodel.uconv2(tmodel.laps[1], torch.cat([dt, e2t], dim=2))
        diffs["uconv2 (ResBlock dec L1)"] = rel_diff(dj, dt)

        dj = unpools[0](dj, i1j)
        dt = healpix_max_unpool(dt, i1t)
        dj = model.uconv1.apply(params["uconv1"],
                                jnp.concatenate([dj, e1j], axis=2),
                                cheb_op=ops[0])
        dt = tmodel.uconv1(tmodel.laps[0], torch.cat([dt, e1t], dim=2))
        diffs["uconv1 (ResBlock dec L0)"] = rel_diff(dj, dt)

        dj = model.uconv1_final.apply(params["uconv1_final"], dj,
                                      cheb_op=ops[0])
        dt = tmodel.uconv1_final(tmodel.laps[0], dt)
        diffs["uconv1_final"] = rel_diff(dj, dt)

        yj = model.apply(params, xj)
        yt = tmodel(xt)
        diffs["full model forward"] = rel_diff(yj, yt)
    return diffs


def gradient_diffs(pair, n_scan: int = 3) -> dict:
    """Max-rel-diff of dLoss/dparam for every parameter tensor of the AR
    loss (RNN strategy, prediction feedback through all iterations)."""
    import jax
    import jax.numpy as jnp
    import torch

    from deepsphere_weather_tpu.engine.step import make_ar_loss_fn, make_context
    from parity_torch import ar_loss_torch

    model, params, tmodel = pair["model"], pair["params"], pair["tmodel"]
    indexer, area_w = pair["indexer"], pair["area_w"]
    b = pair["batch"]

    ctx = make_context(model, jnp.asarray(area_w))
    loss_fn = make_ar_loss_fn(model, indexer, n_scan, "RNN")
    w = jnp.ones(n_scan)
    bj = {k: jnp.asarray(v) for k, v in b.items()}
    (total_j, per_j), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, bj, w, ctx)

    bt = {k: torch.from_numpy(v) for k, v in b.items()}
    total_t, per_t = ar_loss_torch(tmodel, bt, indexer, n_scan,
                                   torch.ones(n_scan),
                                   torch.from_numpy(area_w))
    tmodel.zero_grad()
    total_t.backward()

    out = {"loss": rel_diff(np.asarray(total_j), total_t.item()),
           "per_iter_losses": rel_diff(np.asarray(per_j),
                                       per_t.detach().numpy())}

    # JAX pytree leaf <-> torch parameter mapping
    def tgrad(name):
        p = dict(tmodel.named_parameters())[name]
        return p.grad.detach().numpy()

    gmax = 0.0
    for blk in ("conv1", "conv2", "conv3", "uconv2", "uconv1",
                "uconv1_final"):
        g = grads[blk]
        tb = getattr(tmodel, blk)
        for i in range(len(tb.convs)):
            gmax = max(gmax, rel_diff(g[f"convblock{i+1}"]["weight"],
                                      tgrad(f"{blk}.convs.{i}.weight")))
            gmax = max(gmax, rel_diff(g[f"convblock{i+1}"]["bias"],
                                      tgrad(f"{blk}.convs.{i}.bias")))
        gmax = max(gmax, rel_diff(g["rezero_weight"], tgrad(f"{blk}.rezero")))
        if tb.proj is not None:
            gmax = max(gmax, rel_diff(np.asarray(g["res_kernel"]).T,
                                      tgrad(f"{blk}.proj.weight")))
            gmax = max(gmax, rel_diff(g["res_bias"],
                                      tgrad(f"{blk}.proj.bias")))
    gmax = max(gmax, rel_diff(grads["res_increment"], tgrad("res_increment")))
    out["max over all parameter gradients"] = gmax
    return out


def training_trajectories(pair, steps: int, lr: float = 1e-3,
                          n_scan: int = 3, seed: int = 1):
    """Train both sides on IDENTICAL random batches; return loss curves."""
    import jax
    import jax.numpy as jnp
    import optax
    import torch

    from deepsphere_weather_tpu.engine.step import (make_context,
                                                    make_train_step)
    from parity_torch import ar_loss_torch

    model, tmodel = pair["model"], pair["tmodel"]
    indexer, area_w = pair["indexer"], pair["area_w"]
    n_node, out_feat = pair["n_node"], pair["out_feat"]
    in_feat = pair["in_feat"]
    W = indexer.window_size
    B = pair["batch"]["dynamic"].shape[0]

    params = jax.device_put(pair["params"])
    optimizer = optax.adam(lr, eps=1e-7)
    opt_state = optimizer.init(params)
    ctx = make_context(model, jnp.asarray(area_w))
    train_step = jax.jit(make_train_step(model, indexer, optimizer, n_scan,
                                         "RNN"))
    topt = torch.optim.Adam(tmodel.parameters(), lr=lr, eps=1e-7)
    w = jnp.ones(n_scan)
    wt = torch.ones(n_scan)
    area_t = torch.from_numpy(area_w)

    rng = np.random.default_rng(seed)
    jl, tl = [], []
    static = pair["batch"]["static"]
    for _ in range(steps):
        batch = {
            "dynamic": rng.standard_normal(
                (B, W, n_node, out_feat)).astype(np.float32),
            "bc": rng.standard_normal((B, W, n_node, 1)).astype(np.float32),
            "static": static,
        }
        bj = {k: jnp.asarray(v) for k, v in batch.items()}
        params, opt_state, total, _ = train_step(params, opt_state, bj, w, ctx)
        jl.append(float(total))

        bt = {k: torch.from_numpy(v) for k, v in batch.items()}
        topt.zero_grad()
        tt, _ = ar_loss_torch(tmodel, bt, indexer, n_scan, wt, area_t)
        tt.backward()
        topt.step()
        tl.append(float(tt))
    return np.asarray(jl), np.asarray(tl), params


def bn_parity(pair, n_batches: int = 4, n_scan: int = 2, seed: int = 3):
    """BatchNorm training-loop parity (VERDICT r2 #4).

    Golden-tests the WHOLE BN loop against torch, not just the layer:
    1. train-mode AR-loss agreement per batch (both sides normalize with
       batch statistics — reference my_models_graph.py:97-118),
    2. running-statistic agreement after n_batches of momentum-0.1
       updates (engine/step.py::fold_running_stats vs torch
       BatchNorm1d's own buffer updates during forward),
    3. eval-mode validation-loss agreement using each side's OWN
       accumulated running stats (reference validates under
       model.eval()).
    Requires a pair built with batch_norm=True.
    """
    import jax.numpy as jnp
    import torch

    from deepsphere_weather_tpu.engine.step import (fold_running_stats,
                                                    make_ar_loss_fn,
                                                    make_context)
    from parity_torch import ar_loss_torch, torch_running_stats

    model, params, tmodel = pair["model"], pair["params"], pair["tmodel"]
    indexer, area_w = pair["indexer"], pair["area_w"]
    n_node, out_feat = pair["n_node"], pair["out_feat"]
    W = indexer.window_size
    B = pair["batch"]["dynamic"].shape[0]
    static = pair["batch"]["static"]

    ctx = make_context(model, jnp.asarray(area_w))
    train_loss = make_ar_loss_fn(model, indexer, n_scan, "RNN",
                                 collect_stats=True)
    eval_loss = make_ar_loss_fn(model, indexer, n_scan, "RNN",
                                eval_mode=True)
    norm_state = model.init_norm_state()
    w = jnp.ones(n_scan)
    wt = torch.ones(n_scan)
    area_t = torch.from_numpy(area_w)

    rng = np.random.default_rng(seed)
    diffs = {}
    tmodel.train()
    loss_d = 0.0
    for _ in range(n_batches):
        batch = {
            "dynamic": rng.standard_normal(
                (B, W, n_node, out_feat)).astype(np.float32),
            "bc": rng.standard_normal((B, W, n_node, 1)).astype(np.float32),
            "static": static,
        }
        bj = {k: jnp.asarray(v) for k, v in batch.items()}
        total_j, (_, stats) = train_loss(params, bj, w, ctx)
        norm_state = fold_running_stats(norm_state, stats)

        bt = {k: torch.from_numpy(v) for k, v in batch.items()}
        with torch.no_grad():
            total_t, _ = ar_loss_torch(tmodel, bt, indexer, n_scan, wt,
                                       area_t)
        loss_d = max(loss_d, rel_diff(np.asarray(total_j), total_t.item()))
        eval_batch = batch
    diffs["train-mode AR loss (batch statistics)"] = loss_d

    # running statistics after the same update sequence. Means are
    # compared relative to sqrt(var) — the scale normalization divides
    # by — because a BN mean is statistically ~0 and a max|mean|
    # denominator turns fp32 noise (~1e-6 absolute) into a fake 1e-3
    # "relative" error.
    t_state = torch_running_stats(tmodel)
    sd = 0.0
    for blk, bstate in t_state.items():
        for cb, s in bstate.items():
            ours = norm_state[blk][cb]
            scale = max(float(np.sqrt(np.asarray(ours["var"]).max())), 1e-30)
            sd = max(sd, float(np.abs(np.asarray(ours["mean"], np.float64)
                                      - s["mean"]).max()) / scale)
            sd = max(sd, rel_diff(ours["var"], s["var"]))
    diffs[f"running stats after {n_batches} momentum-0.1 updates"] = sd

    # eval-mode validation loss with each side's OWN running stats
    tmodel.eval()
    bj = {k: jnp.asarray(v) for k, v in eval_batch.items()}
    total_j, _ = eval_loss(params, bj, w,
                           {**ctx, "norm_state": norm_state})
    bt = {k: torch.from_numpy(v) for k, v in eval_batch.items()}
    with torch.no_grad():
        total_t, _ = ar_loss_torch(tmodel, bt, indexer, n_scan, wt, area_t)
    diffs["eval-mode validation loss (running stats)"] = rel_diff(
        np.asarray(total_j), total_t.item())
    return diffs


def rmse_rollout(pair, params_jax, ar_steps: int = 6):
    """Per-leadtime RMSE from each side's own trained weights on a shared
    held-out batch (autoregressive rollout, prediction feedback)."""
    import jax.numpy as jnp
    import torch

    from deepsphere_weather_tpu.data.ar import ARIndexer
    from parity_torch import ar_loss_torch  # noqa: F401 (doc pointer)

    model, tmodel = pair["model"], pair["tmodel"]
    n_node, out_feat, in_feat = (pair["n_node"], pair["out_feat"],
                                 pair["in_feat"])
    ix = ARIndexer.build([-3, -2, -1], [0], 1, ar_steps)
    rng = np.random.default_rng(42)
    W = ix.window_size
    B = 4
    dyn = rng.standard_normal((B, W, n_node, out_feat)).astype(np.float32)
    bc = rng.standard_normal((B, W, n_node, 1)).astype(np.float32)
    static = pair["batch"]["static"]

    def rollout(apply_fn, to_np):
        buf = dyn.copy()
        rmses = []
        for i in range(ar_steps + 1):
            pin, pout = ix.input_pos[i], ix.output_pos[i]
            x = np.concatenate([
                np.broadcast_to(static[None, None],
                                (B, len(pin)) + static.shape),
                bc[:, pin], buf[:, pin]], axis=-1)
            y = to_np(apply_fn(x))
            rmses.append(float(np.sqrt(np.mean((y - dyn[:, pout]) ** 2))))
            buf[:, pout] = y
        return np.asarray(rmses)

    r_j = rollout(lambda x: model.apply(params_jax, jnp.asarray(x)),
                  np.asarray)
    with torch.no_grad():
        r_t = rollout(lambda x: tmodel(torch.from_numpy(x)),
                      lambda y: y.numpy())
    return r_j, r_t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdivisions", type=int, default=8)
    ap.add_argument("--knn", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--train-steps", type=int, default=60)
    args = ap.parse_args()

    t0 = time.time()
    pair = build_pair(args.subdivisions, args.knn, args.batch, ar_iters=2)
    print(f"pair built ({time.time()-t0:.0f}s)")

    fwd = forward_block_diffs(pair)
    for k, v in fwd.items():
        print(f"forward {k}: {v:.2e}")
    grad = gradient_diffs(pair)
    for k, v in grad.items():
        print(f"grad {k}: {v:.2e}")

    jl, tl, params_trained = training_trajectories(pair, args.train_steps)
    tr_diff = np.abs(jl - tl) / np.maximum(np.abs(tl), 1e-12)
    print(f"training losses: max rel diff {tr_diff.max():.2e} "
          f"(step {tr_diff.argmax()}), final jax {jl[-1]:.6f} "
          f"torch {tl[-1]:.6f}")

    r_j, r_t = rmse_rollout(pair, params_trained)
    rm_diff = np.abs(r_j - r_t) / r_t
    print(f"rollout RMSE curves: max rel diff {rm_diff.max():.2e}")

    # BatchNorm twin: whole-loop golden test (train-mode loss, running
    # stats, eval-mode validation) at a smaller resolution — the BN math
    # is resolution-independent and the torch side dominates wall time
    bn_pair = build_pair(max(4, args.subdivisions // 2), args.knn,
                         args.batch, ar_iters=2, batch_norm=True)
    bn = bn_parity(bn_pair)
    for k, v in bn.items():
        print(f"batch_norm {k}: {v:.2e}")

    # ---- write the committed report -----------------------------------
    doc = Path(__file__).resolve().parent.parent / "docs" / "PARITY_NUMERIC.md"
    lines = [
        "# Numerical parity vs the PyTorch reference stack",
        "",
        "Generated by `python scripts/run_parity.py` "
        f"(HEALPix-{args.subdivisions}, knn {args.knn}, batch {args.batch}, "
        "fp32, CPU). The torch twin (`scripts/parity_torch.py`) re-expresses "
        "the reference's exact model semantics (torch.sparse.mm Chebyshev, "
        "MaxPool1d/MaxUnpool1d HEALPix pooling, ReZero ResBlocks, increment "
        "learning, WeightedMSELoss 'mean', RNN-strategy AR feedback — "
        "reference modules/layers.py, my_models_graph.py, loss.py) and loads "
        "IDENTICAL weights from the JAX model's params pytree.",
        "",
        "Both sides compute in fp32; differences are pure arithmetic "
        "reassociation (the JAX side evaluates Chebyshev via Clenshaw on "
        "the narrow side and fuses channel mixes; torch runs the direct "
        "recurrence) — at fp32 that bounds agreement near 1e-6 relative.",
        "",
        "## 1. Forward agreement at identical weights (max rel diff)",
        "",
        "| Block | max rel diff |",
        "|---|---|",
    ]
    lines += [f"| {k} | {v:.2e} |" for k, v in fwd.items()]
    lines += [
        "",
        "## 2. AR-loss gradients (RNN strategy, 3 scan iterations)",
        "",
        "| Quantity | max rel diff |",
        "|---|---|",
    ]
    lines += [f"| {k} | {v:.2e} |" for k, v in grad.items()]
    lines += [
        "",
        f"## 3. Training trajectory ({args.train_steps} Adam steps, "
        "identical batches)",
        "",
        f"max per-step loss rel diff **{tr_diff.max():.2e}** "
        f"(final losses: jax {jl[-1]:.6f}, torch {tl[-1]:.6f})",
        "",
        "| step | jax loss | torch loss | rel diff |",
        "|---|---|---|---|",
    ]
    idx = list(range(0, len(jl), max(1, len(jl) // 12))) + [len(jl) - 1]
    for i in sorted(set(idx)):
        lines.append(f"| {i} | {jl[i]:.6f} | {tl[i]:.6f} | {tr_diff[i]:.1e} |")
    lines += [
        "",
        "## 4. Post-training AR rollout RMSE (each side's own weights)",
        "",
        f"max rel diff **{rm_diff.max():.2e}** across "
        f"{len(r_j)} leadtimes",
        "",
        "| leadtime step | jax RMSE | torch RMSE |",
        "|---|---|---|",
    ]
    lines += [f"| {i} | {a:.6f} | {b:.6f} |"
              for i, (a, b) in enumerate(zip(r_j, r_t))]
    lines += [
        "",
        "## 5. BatchNorm training loop (batch_norm: true twin)",
        "",
        "Running statistics update with momentum 0.1 INSIDE the jitted "
        "train step (engine/step.py::fold_running_stats); validation "
        "scores in eval mode with those stats — matching torch "
        "BatchNorm1d semantics end-to-end "
        "(reference my_models_graph.py:97-118 + model.eval() validation).",
        "",
        "| Quantity | max rel diff |",
        "|---|---|",
    ]
    lines += [f"| {k} | {v:.2e} |" for k, v in bn.items()]
    lines += [
        "",
        "## Verdict",
        "",
        "Forward, backward, optimization trajectory and post-training "
        "rollout skill all agree within fp32 reassociation noise. The JAX "
        "framework computes the same model as the reference stack; the "
        "north star's 'RMSE parity' reduces to running the same protocol.",
        "",
        f"_Last run: {time.strftime('%Y-%m-%d')} in "
        f"{time.time()-t0:.0f}s._",
    ]
    doc.write_text("\n".join(lines) + "\n")
    print(f"wrote {doc}")

    ok = (max(fwd.values()) < 5e-5
          and max(grad.values()) < 5e-4
          and tr_diff.max() < 5e-3
          and rm_diff.max() < 5e-3
          and max(bn.values()) < 5e-4)
    print("PARITY:", "OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
