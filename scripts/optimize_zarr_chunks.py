"""Chunk-size x compressor optimization study for the zarr stores.

Parity with the reference's storage study (reference
scripts/03b_optimize_zarr_chunks.py: sweep time-chunk sizes and blosc
codecs over a temporary store, time write/read, pick the configuration
for the canonical time_chunked layout). This driver sweeps

    time_chunk x codec in {none, zlib, blosc:lz4, blosc:zstd}

over a synthetic-toy store, measuring write wall time, the three read
patterns the AR pipeline cares about (`profile_zarr_io`: training
time-slices, verification node-series, full scan) and the compression
ratio, then writes a recommendation table to
docs/benchmarks/zarr_chunk_study.json.

Usage: python scripts/optimize_zarr_chunks.py [--subdivisions 16]
       [--n_timesteps 2920] [--out docs/benchmarks/zarr_chunk_study.json]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdivisions", type=int, default=16)
    ap.add_argument("--n_timesteps", type=int, default=2920)  # 2 years @ 6 h
    ap.add_argument("--out", default=str(ROOT / "docs" / "benchmarks"
                                         / "zarr_chunk_study.json"))
    args = ap.parse_args()

    from deepsphere_weather_tpu.data.dataset import save_dynamic
    from deepsphere_weather_tpu.data.toy import generate_toy_data
    from deepsphere_weather_tpu.data.zarrstore import profile_zarr_io
    from deepsphere_weather_tpu.native import bloscio

    codecs = [None, "zlib", "blosc:lz4", "blosc:zstd"]
    if not bloscio.available():
        codecs = [c for c in codecs
                  if not (isinstance(c, str) and c.startswith("blosc"))]
        print("libblosc unavailable: skipping blosc codecs")
    # reference sweeps multiples of day/week/month chunks
    # (03b:83: 24*30*m hours); at 6-hourly resolution:
    day = 4
    time_chunks = [day, 7 * day, 28 * day, 112 * day, args.n_timesteps]

    tmp = Path(tempfile.mkdtemp(prefix="zarr_study_"))
    print(f"generating toy fields (HEALPix-{args.subdivisions}, "
          f"{args.n_timesteps} steps) ...", flush=True)
    ds_dyn, _, _ = generate_toy_data(
        tmp / "gen", sampling_kwargs={"subdivisions": args.subdivisions,
                                      "nest": True},
        n_timesteps=args.n_timesteps, seed=5)
    fields = {n: ds_dyn.variables[n][...] for n in ds_dyn.feature_order}
    tvals = np.asarray(ds_dyn.time, dtype="datetime64[ns]")

    rows = []
    for tc in time_chunks:
        for codec in codecs:
            store = tmp / f"s_{tc}_{codec or 'none'}".replace(":", "_")
            t0 = time.perf_counter()
            save_dynamic(store, fields, time=tvals,
                         lat=ds_dyn.lat, lon=ds_dyn.lon,
                         time_chunk=tc, compressor=codec, overwrite=True)
            w = time.perf_counter() - t0
            prof = profile_zarr_io(store)
            rows.append({
                "time_chunk": int(tc), "codec": codec or "none",
                "write_s": round(w, 3),
                "compression_ratio": round(prof["compression_ratio"], 2),
                "read_time_slice_MBps": round(prof["read_time_slice_MBps"]),
                "read_node_series_MBps": round(
                    prof["read_node_series_MBps"]),
                "read_full_MBps": round(prof["read_full_MBps"]),
            })
            print(rows[-1], flush=True)
            shutil.rmtree(store)

    # recommendation: the training loader reads time slices; weight read
    # throughput against on-disk size (the reference's criteria: fast
    # reads at reasonable compression, 03b "choose the best compressor")
    def score(r):
        return r["read_time_slice_MBps"] * min(r["compression_ratio"], 4.0)

    best = max(rows, key=score)
    result = {
        "config": f"HEALPix-{args.subdivisions}, {args.n_timesteps} steps "
                  "(z500+t850 float32), single-host local disk",
        "rows": rows,
        "recommendation": {
            **best,
            "rationale": "max read_time_slice_MBps * min(ratio, 4): the "
                         "training loader reads time windows; compression "
                         "beyond ~4x buys little disk for real spectra",
        },
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(result, indent=1))
    print(f"wrote {out}")
    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
