"""Production serving: AOT model export and a forecast service.

The reference has no deployment story — inference means re-importing the
training code and rebuilding the model from config
(reference: scripts_training/predict_state.py:52-215). TPU-native serving
should not need the model-building code at all: `jax.export` serializes
the jitted AR rollout (with trained params, static features and graph
geometry baked in as constants) to a self-contained StableHLO artifact
that any JAX process can deserialize, compile and run — compile-once,
serve-anywhere.

- `export_rollout` / `save_artifact` / `load_artifact` — build, persist
  and reload exported rollout artifacts (`serve/export.py`).
- `ForecastService` — loads an artifact and serves forecasts: input
  scaling, batch padding, block-chunked rollouts, inverse scaling, and
  optional micro-batching of concurrent requests (`serve/service.py`).
- `python -m deepsphere_weather_tpu.cli.export_model` exports a trained
  experiment directory; `cli.serve` exposes the service over stdlib HTTP.
"""

from .export import (ExportedRollout, export_ensemble_rollout,
                     export_rollout, load_artifact, save_artifact)
from .service import ForecastService

__all__ = ["ExportedRollout", "export_rollout", "export_ensemble_rollout",
           "save_artifact", "load_artifact", "ForecastService"]
