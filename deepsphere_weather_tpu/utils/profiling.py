"""Profiling & scalability harness.

Parity with the reference's observability tooling (SURVEY.md §5.1):
- `summarize_model`: parameter/shape report (reference torchinfo.summary
  usage, train_predict_state.py:283-294)
- `profile_step`: per-step timing via device-synchronized medians, plus
  optional jax.profiler trace dump (reference torch.autograd.profiler,
  dev/dev_model_profiler.py:336-351)
- `scalability_sweep`: forward+backward wall time vs #nodes x knn
  (reference scripts_figs/scalability_plot.py:68-216; O24->O320 Gauss
  grids on the reference's GPU, any sampling family here)
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

__all__ = ["summarize_model", "profile_model", "profile_step",
           "scalability_sweep"]


def summarize_model(model, params) -> str:
    """Parameter-count summary per top-level block."""
    import jax

    lines = [f"{type(model).__name__}"]
    total = 0
    for name, sub in params.items():
        leaves = jax.tree_util.tree_leaves(sub)
        n = sum(int(np.prod(l.shape)) for l in leaves)
        total += n
        shapes = (f"{len(leaves)} tensors" if len(leaves) > 1
                  else str(leaves[0].shape))
        lines.append(f"  {name:<22} {n:>12,}  ({shapes})")
    lines.append(f"  {'TOTAL':<22} {total:>12,} parameters")
    return "\n".join(lines)


def profile_model(model, params=None, batch_size: int = 1, n: int = 10,
                  trace_dir: Optional[str] = None, seed: int = 0) -> Dict:
    """Compile-time cost + runtime profile of a model forward pass.

    TPU-native equivalent of the reference's `profile_model`
    (torch.autograd.profiler wrapper, dev/dev_model_profiler.py:336-351):
    reports XLA's static cost analysis (FLOPs, HBM bytes accessed) and
    memory analysis of the compiled executable alongside measured
    device-synchronized step times; `trace_dir` additionally dumps a
    jax.profiler trace for per-op inspection in TensorBoard/Perfetto.
    """
    import jax

    if params is None:
        params = model.init(jax.random.key(seed))
    params = jax.device_put(params)
    geom = jax.device_put(model.geometry_pytree())
    x = jax.device_put(np.random.default_rng(seed).standard_normal(
        (batch_size, model.input_n_time, model.input_n_node,
         model.input_n_feature)).astype(np.float32))

    fn = jax.jit(lambda p, g, x: model.apply(p, x, geom=g))
    # one compile: the AOT executable serves both the cost/memory
    # analysis and the timed runs below
    compiled = fn.lower(params, geom, x).compile()
    out: Dict = {"batch_size": batch_size}
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        out["flops"] = float(cost.get("flops", float("nan")))
        out["bytes_accessed"] = float(cost.get("bytes accessed",
                                                float("nan")))
    except Exception:  # cost analysis is backend-dependent
        pass
    try:
        mem = compiled.memory_analysis()
        out["peak_memory_bytes"] = int(
            getattr(mem, "temp_size_in_bytes", 0)
            + getattr(mem, "argument_size_in_bytes", 0)
            + getattr(mem, "output_size_in_bytes", 0))
    except Exception:
        pass
    out.update(profile_step(compiled, params, geom, x, n=n,
                            trace_dir=trace_dir))
    if "flops" in out and out["median_s"] > 0:
        out["tflops_per_s"] = out["flops"] / out["median_s"] / 1e12
    return out


def _force_sync(out):
    """Truly wait for `out`: fetch one scalar element to host.

    On tunneled runtimes (the `axon` platform) `block_until_ready` returns
    before execution completes; only a device->host scalar read is a real
    sync. The fetch itself costs one tunnel RTT — callers measuring
    steady-state throughput should enqueue N steps and sync once.
    """
    import jax

    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "block_until_ready")]
    for x in leaves:
        x.block_until_ready()
    if leaves:
        _ = np.asarray(jax.numpy.ravel(leaves[0])[0])


def profile_step(fn, *args, n: int = 10, warmup: int = 2,
                 trace_dir: Optional[str] = None,
                 pipelined: bool = False) -> Dict:
    """Median/percentile timing of a jitted step; optional profiler trace.

    pipelined=True measures steady-state throughput: all n calls are
    enqueued back-to-back with ONE final sync (how training loops run);
    per-call percentiles are then not meaningful and only median_s (the
    per-step average) is reported.
    """
    out = None
    for _ in range(warmup):
        out = fn(*args)
    if out is not None:
        _force_sync(out)
    if pipelined:
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _force_sync(out)
        per = (time.perf_counter() - t0) / n
        return {"median_s": per, "p10_s": per, "p90_s": per, "n": n,
                "pipelined": True}
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        _force_sync(out)
        times.append(time.perf_counter() - t0)
    if trace_dir is not None:
        import jax

        with jax.profiler.trace(str(trace_dir)):
            out = fn(*args)
            _force_sync(out)
    times = sorted(times)
    return {"median_s": times[len(times) // 2],
            "p10_s": times[int(len(times) * 0.1)],
            "p90_s": times[int(len(times) * 0.9)],
            "n": n}


def scalability_sweep(samplings: Optional[List[Dict]] = None,
                      knn_list=(8, 20, 40),
                      batch_size: int = 1,
                      out_json: Optional[str] = None) -> List[Dict]:
    """Forward+backward wall time vs #nodes x knn for UNetSpherical
    (reference scalability harness, scripts_figs/scalability_plot.py)."""
    import json

    import jax
    import jax.numpy as jnp

    from ..models import UNetSpherical

    if samplings is None:
        samplings = [
            {"sampling": "healpix", "sampling_kwargs": {"subdivisions": s,
                                                        "nest": True}}
            for s in (8, 16, 32)
        ]
    results = []
    for spec in samplings:
        for knn in knn_list:
            n_node = None
            tensor_info = {
                "input_n_feature": 7, "output_n_feature": 2,
                "input_n_time": 3, "output_n_time": 1,
                "input_shape_info": {"dynamic": {"node": 0}},
                "output_shape_info": {"dynamic": {"node": 0}},
                "dim_order": {"dynamic": ["sample", "time", "node",
                                          "feature"]},
            }
            # build a sampling first to get node count
            from ..sphere import build_sampling
            samp = build_sampling(spec["sampling"], spec["sampling_kwargs"])
            n_node = samp.n_nodes
            tensor_info["input_shape_info"]["dynamic"]["node"] = n_node
            tensor_info["output_shape_info"]["dynamic"]["node"] = n_node
            model = UNetSpherical(tensor_info=tensor_info, knn=knn,
                                  pool_method="max", **spec)
            params = jax.device_put(model.init(jax.random.key(0)))
            geom = jax.device_put(model.geometry_pytree())
            x = jax.device_put(np.random.default_rng(0).standard_normal(
                (batch_size, 3, n_node, 7)).astype(np.float32))

            def loss(p, g, x):
                return jnp.sum(model.apply(p, x, geom=g) ** 2)

            fwd = jax.jit(lambda p, g, x: model.apply(p, x, geom=g))

            # fwd+bwd as a CHAINED sgd step (params flow call-to-call,
            # params donated — as the real train step runs): unchained
            # grad calls measure per-output buffer-handle overhead on
            # tunneled runtimes, not compute
            import functools

            @functools.partial(jax.jit, donate_argnums=(0,))
            def train(p, g, x):
                grads = jax.grad(loss)(p, g, x)
                return jax.tree_util.tree_map(
                    lambda a, d: a - 1e-9 * d, p, grads)

            t_fwd = profile_step(fwd, params, geom, x, n=10, pipelined=True)
            p = train(params, geom, x)
            _force_sync(p)
            import time as _time
            t0 = _time.perf_counter()
            for _ in range(10):
                p = train(p, geom, x)
            _force_sync(p)
            t_bwd = {"median_s": (_time.perf_counter() - t0) / 10}
            results.append({
                "sampling": spec["sampling"],
                "sampling_kwargs": spec["sampling_kwargs"],
                "n_nodes": n_node, "knn": knn, "batch_size": batch_size,
                "forward_ms": t_fwd["median_s"] * 1e3,
                "forward_backward_ms": t_bwd["median_s"] * 1e3,
            })
            print(results[-1], flush=True)
    if out_json:
        Path(out_json).write_text(json.dumps(results, indent=1))
    return results
