"""Validate that EVERY shipped config builds and runs.

For each of the 108 JSON configs under configs/ (7 samplings x 6 pool
methods x 3 graph types, reference: scripts/07_create_configs.py:78-110):
read + strict-validate, build the model (full geometry: graphs,
Laplacians, pool/unpool matrices), init params, and run one forward pass
at the config's true node count. This backs the PARITY.md claim that all
shipped configs are runnable (the reference's mesh/learn configs are not:
modules/models.py:49-60 raises on 'mesh', layers.py:1107 on 'learn').

Geometry is disk-cached (sphere/cache.py), so re-runs are cheap. Run on
CPU so results do not depend on TPU availability:
  JAX_PLATFORMS=cpu python scripts/validate_all_configs.py
"""
import json
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

# force the host CPU backend (the env's TPU plugin registers itself even
# under JAX_PLATFORMS=cpu; jax.config before first backend use wins) —
# remote TPU compiles reject the big-graph configs' payloads
jax.config.update("jax_platforms", "cpu")

import numpy as np

from deepsphere_weather_tpu.config import (get_ar_settings,
                                           get_model_settings,
                                           get_training_settings,
                                           read_config_file)
from deepsphere_weather_tpu.models import get_model
from deepsphere_weather_tpu.sphere import build_sampling

ROOT = Path(__file__).resolve().parents[1]


def main() -> int:
    paths = sorted((ROOT / "configs").rglob("*.json"))
    if len(sys.argv) > 1:   # substring filters, e.g. Healpix_100km
        paths = [p for p in paths
                 if any(s in str(p) for s in sys.argv[1:])]
    print(f"{len(paths)} configs")
    failures = []
    for p in paths:
        rel = p.relative_to(ROOT / "configs")
        t0 = time.perf_counter()
        try:
            cfg = read_config_file(p)
            ms = get_model_settings(cfg)
            ts = get_training_settings(cfg)
            get_ar_settings(cfg)
            samp = build_sampling(ms["sampling"],
                                  dict(ms["sampling_kwargs"]))
            n = samp.n_nodes
            tensor_info = {
                "input_n_feature": 7, "output_n_feature": 2,
                "input_n_time": 3, "output_n_time": 1,
                "input_shape_info": {"dynamic": {"node": n}},
                "output_shape_info": {"dynamic": {"node": n}},
                "dim_order": {"dynamic":
                              ["sample", "time", "node", "feature"]},
                "feature_order": {"dynamic": ["z500", "t850"]},
            }
            kw = {k: v for k, v in ms.items() if k != "architecture_name"}
            kw["pool_method"] = str(kw["pool_method"]).lower()
            kw["numeric_precision"] = ts.get("numeric_precision", "float32")
            model = get_model(ms["architecture_name"], tensor_info, **kw)
            params = model.init(jax.random.key(0))
            x = np.random.default_rng(0).standard_normal(
                (1, 3, n, 7)).astype(np.float32)
            # geometry as a jit ARGUMENT (like the production steps) —
            # inlining the Laplacians as constants bloats the HLO
            geom = model.geometry_pytree()
            y = jax.jit(model.apply)(params, x, geom=geom)
            assert y.shape == (1, 1, n, 2), y.shape
            assert bool(np.isfinite(np.asarray(y)).all()), "non-finite output"
            print(f"OK   {rel}  n={n}  "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — report every failure
            failures.append((str(rel), repr(e)))
            traceback.print_exc()
            print(f"FAIL {rel}: {e!r}", flush=True)
    print(f"\n{len(paths) - len(failures)}/{len(paths)} configs OK")
    if len(sys.argv) == 1:   # full sweep: record the result
        out = ROOT / "docs" / "benchmarks" / "config_sweep.json"
        out.write_text(json.dumps(
            {"total": len(paths), "ok": len(paths) - len(failures),
             "failures": failures}, indent=1))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
