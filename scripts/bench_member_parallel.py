"""Member-parallel ensemble training throughput on hardware.

The reference trains DeepEnsemble members as SEQUENTIAL subprocesses and
loops SWAG members one by one (reference:
scripts_training/06_exp_DeepEnsemble.py:62-102,
modules/swag_predictions.py:59-91). Here the member axis is vmapped into
one jitted executable (`engine.make_member_train_step`), and — with the
BCSR custom_vmap rule — the Pallas SpMM folds members into its matvec
columns, amortizing every A-block DMA across the whole ensemble.

This script measures, on the current backend:

  sequential : M back-to-back single-member fused train steps
  vmapped    : ONE member-parallel step advancing all M members

and prints one JSON line per configuration with samples/s for both and
the speedup. Run on a TPU; CPU falls back to interpret-free paths
(dense/ELL) and is only a smoke test.

    python scripts/bench_member_parallel.py [--subdivisions 16 64]
        [--members 4] [--batch 8] [--ar 2] [--repeats 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench_one(subdivisions: int, members: int, batch: int, ar_iters: int,
              repeats: int, remat: bool = False) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from deepsphere_weather_tpu.data.ar import ARIndexer
    from deepsphere_weather_tpu.engine.loss import AreaWeights
    from deepsphere_weather_tpu.engine.step import (
        make_context,
        make_member_train_step,
        make_train_step,
    )
    from deepsphere_weather_tpu.models import UNetSpherical
    from deepsphere_weather_tpu.sphere import build_sampling

    n_node = 12 * subdivisions ** 2
    in_feat, out_feat = 7, 2
    tensor_info = {
        "input_n_feature": in_feat, "output_n_feature": out_feat,
        "input_n_time": 3, "output_n_time": 1,
        "input_shape_info": {"dynamic": {"node": n_node}},
        "output_shape_info": {"dynamic": {"node": n_node}},
        "dim_order": {"dynamic": ["sample", "time", "node", "feature"]},
    }
    model = UNetSpherical(
        tensor_info=tensor_info, sampling="healpix",
        sampling_kwargs={"subdivisions": subdivisions, "nest": True},
        knn=20, pool_method="max", increment_learning=True,
        numeric_precision="bfloat16")
    indexer = ARIndexer.build([-3, -2, -1], [0], 1, ar_iters)
    samp = build_sampling("healpix", {"subdivisions": subdivisions,
                                      "nest": True})
    area_w = AreaWeights(samp)
    optimizer = optax.adam(1e-3, eps=1e-7)
    ctx = make_context(model, area_w)
    n_scan = ar_iters + 1

    # member-stacked params (DeepEnsemble: independent seeds)
    member_params = jax.device_put(jax.vmap(
        lambda k: model.init(k))(jax.random.split(jax.random.key(0),
                                                  members)))
    member_opt = jax.device_put(jax.vmap(optimizer.init)(member_params))

    rng = np.random.default_rng(0)
    W = indexer.window_size
    batch_dict = jax.device_put({
        "dynamic": rng.standard_normal(
            (batch, W, n_node, out_feat)).astype(np.float32),
        "bc": rng.standard_normal((batch, W, n_node, 1)).astype(np.float32),
        "static": rng.standard_normal(
            (n_node, in_feat - out_feat - 1)).astype(np.float32),
    })
    w = jnp.ones(n_scan) / n_scan

    def time_chain(fn, p, o):
        # warmup + compile, then enqueue `repeats` chained steps, one sync
        for _ in range(2):
            p, o, total, _ = fn(p, o, batch_dict, w, ctx)
        jax.block_until_ready(total)
        t0 = time.perf_counter()
        for _ in range(repeats):
            p, o, total, _ = fn(p, o, batch_dict, w, ctx)
        jax.block_until_ready(total)
        return (time.perf_counter() - t0) / repeats

    # --- sequential: M single-member steps back to back -------------------
    step1 = make_train_step(model, indexer, optimizer, n_scan, "RNN",
                            remat=remat)

    def sequential(mp, mo, b, w_, c):
        outs = []
        ps, os_ = [], []
        for m in range(members):
            pm = jax.tree_util.tree_map(lambda a: a[m], mp)
            om = jax.tree_util.tree_map(lambda a: a[m], mo)
            pm, om, t, pi = step1(pm, om, b, w_, c)
            ps.append(pm); os_.append(om); outs.append(t)
        stack = lambda *xs: jnp.stack(xs)
        return (jax.tree_util.tree_map(stack, *ps),
                jax.tree_util.tree_map(stack, *os_),
                jnp.stack(outs).sum(), None)

    seq_s = time_chain(sequential,
                       jax.tree_util.tree_map(jnp.array, member_params),
                       jax.tree_util.tree_map(jnp.array, member_opt))

    # --- vmapped: one executable advances every member ---------------------
    mstep = make_member_train_step(model, indexer, optimizer, n_scan, "RNN",
                                   remat=remat)

    def vmapped(mp, mo, b, w_, c):
        mp, mo, tot, pi = mstep(mp, mo, b, w_, c)
        return mp, mo, tot.sum(), pi

    vm_s = time_chain(vmapped, member_params, member_opt)

    samples = members * batch
    return {
        "subdivisions": subdivisions, "n_nodes": n_node,
        "members": members, "batch": batch, "ar_iterations": ar_iters,
        "remat": remat,
        "sequential_ms_per_ensemble_step": round(seq_s * 1e3, 2),
        "vmapped_ms_per_ensemble_step": round(vm_s * 1e3, 2),
        "sequential_samples_per_sec": round(samples / seq_s, 2),
        "vmapped_samples_per_sec": round(samples / vm_s, 2),
        "speedup": round(seq_s / vm_s, 2),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdivisions", type=int, nargs="+", default=[16, 64])
    ap.add_argument("--members", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ar", type=int, default=2)
    ap.add_argument("--repeats", type=int, default=10)
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint each AR iteration (trades one "
                         "extra forward for ~AR-depth less activation HBM)")
    args = ap.parse_args()

    from deepsphere_weather_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    for sd in args.subdivisions:
        res = bench_one(sd, args.members, args.batch, args.ar, args.repeats,
                        remat=args.remat)
        print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
