"""On-hardware validation of serving export: exports the bf16 flagship
(HEALPix-16, Pallas BCSR operator -> Mosaic tpu_custom_call in the
StableHLO artifact), reloads it via ForecastService and cross-checks the
served forecast against the live model rollout. The pytest suite covers
export on CPU only; run this after touching serve/ or ops/pallas_spmm.py."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax

from deepsphere_weather_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from deepsphere_weather_tpu.models import UNetSpherical
from deepsphere_weather_tpu.serve import (export_rollout, save_artifact,
                                          ForecastService)

SUBDIV, V = 16, 12 * 16 ** 2
tensor_info = {
    "input_n_feature": 7, "output_n_feature": 2,
    "input_n_time": 3, "output_n_time": 1,
    "input_shape_info": {"dynamic": {"node": V}},
    "output_shape_info": {"dynamic": {"node": V}},
    "dim_order": {"dynamic": ["sample", "time", "node", "feature"]},
}
model = UNetSpherical(tensor_info=tensor_info, sampling="healpix",
                      sampling_kwargs={"subdivisions": SUBDIV, "nest": True},
                      knn=20, pool_method="max", increment_learning=True,
                      numeric_precision="bfloat16")
params = model.init(jax.random.key(0))
rng = np.random.default_rng(0)
static = rng.standard_normal((V, 4)).astype(np.float32)
rollout = export_rollout(model, params, input_k=[-3, -2, -1], output_k=[0],
                         forecast_cycle=1, batch_size=4, block_size=5,
                         static=static, n_bc_features=1, timestep_hours=6.0)
print("exported; platforms:", rollout.meta["platforms"])
save_artifact("/tmp/dsw_tpu_export_artifact", rollout)
print("artifact size MB:",
      sum(f.stat().st_size for f in Path('/tmp/dsw_tpu_export_artifact').iterdir()) / 1e6)

svc = ForecastService.from_dir("/tmp/dsw_tpu_export_artifact")
hist = rng.standard_normal((4, 4, V, 2)).astype(np.float32)
bc = rng.standard_normal((4, 7, 3, V, 1)).astype(np.float32)
fc = svc.predict(hist, 7, bc)
print("served forecast:", fc.shape, "finite:", np.isfinite(fc).all())

# cross-check against the live model rollout
from deepsphere_weather_tpu.data.ar import ARIndexer
from deepsphere_weather_tpu.engine.step import make_rollout_block
idx = ARIndexer.build([-3, -2, -1], [0], 1, 1)
fn, H = make_rollout_block(model, idx, 5, jit=False)
geom = jax.device_put(model.geometry_pytree())
h, chunks = hist, []
bcp = np.concatenate([bc, np.repeat(bc[:, -1:], 3, axis=1)], axis=1)
for b in range(2):
    h, _, p = jax.jit(fn)(params, h, None, bcp[:, b * 5:(b + 1) * 5],
                          static, geom)
    chunks.append(np.asarray(p))
want = np.concatenate(chunks, axis=1)[:, :7]
err = np.abs(fc - want).max() / (np.abs(want).max() + 1e-9)
print("max rel err vs live rollout:", err)
assert err < 2e-2, err   # bf16 compute
print("TPU export/serve check OK")
