"""Host input-pipeline throughput benchmark (SURVEY.md §7 hard part 6).

Measures AutoregressiveDataLoader samples/s on the flagship AR6
window shape (HEALPix-16, batch 16) across num_workers, from a real
time-chunked zlib zarr store. The device step consumes ~680 samples/s
(bench.py); the loader must beat that to keep the MXU fed.
Measured on this host: ~20 samples/s before the decompressed-chunk
LRU cache (every 10-step window read inflated full 168-step chunks),
~800 samples/s after (data/zarrstore.py::_ChunkCache).
"""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from deepsphere_weather_tpu.data import (generate_toy_data,
                                         GlobalStandardScaler)
from deepsphere_weather_tpu.data.ar import ARIndexer
from deepsphere_weather_tpu.data.loader import (AutoregressiveDataset,
                                                AutoregressiveDataLoader)

d = Path("/tmp/dsw_loader_bench_data")
if not (d / "Data").exists():
    t0 = time.perf_counter()
    generate_toy_data(d, sampling_kwargs={"subdivisions": 16, "nest": True},
                      n_timesteps=1460, seed=0)
    print(f"toy data gen: {time.perf_counter()-t0:.1f}s")

from deepsphere_weather_tpu.data import SphericalDataset, StaticDataset
dyn = SphericalDataset.open(d / "Data" / "dynamic" / "time_chunked" / "dynamic.zarr")
bc = SphericalDataset.open(d / "Data" / "bc" / "time_chunked" / "bc.zarr")
static = StaticDataset.open(d / "Data" / "static.zarr")
scaler = GlobalStandardScaler().fit_dataset(dyn)

indexer = ARIndexer.build([-3, -2, -1], [0], 1, 6)   # AR6 flagship
for nw in (0, 1, 2, 4, 8):
    ds = AutoregressiveDataset(dyn, indexer, data_bc=bc, data_static=static,
                               scaler=scaler)
    dl = AutoregressiveDataLoader(ds, batch_size=16, shuffle=True,
                                  shuffle_seed=0, num_workers=nw,
                                  prefetch_factor=4)
    it = iter(dl)
    for _ in range(3):   # warm
        next(it)
    t0 = time.perf_counter()
    n = 0
    for _ in range(40):
        b = next(it)
        n += b["dynamic"].shape[0]
    dt = time.perf_counter() - t0
    print(f"num_workers={nw}: {n/dt:8.1f} samples/s  ({dt/40*1e3:.1f} ms/batch)")
