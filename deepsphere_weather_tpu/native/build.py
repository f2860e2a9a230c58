"""Build the native geometry library: python -m deepsphere_weather_tpu.native.build"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path


def build(verbose: bool = True) -> Path:
    here = Path(__file__).parent
    src = here / "geometry.cpp"
    out = here / "libdsw_geometry.so"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           str(src), "-o", str(out)]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    build_chunkio(verbose=verbose)
    return out


def build_chunkio(verbose: bool = True) -> Path:
    here = Path(__file__).parent
    src = here / "chunkio.cpp"
    out = here / "libdsw_chunkio.so"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           str(src), "-o", str(out), "-lz", "-lpthread", "-ldl"]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    # quick self-check against the numpy path
    sys.path.insert(0, str(Path(__file__).parents[2]))
    import numpy as np

    from deepsphere_weather_tpu.native import geometry as native_geom
    from deepsphere_weather_tpu.sphere import build_sampling
    from deepsphere_weather_tpu.sphere.remap import _conservative_weights_numpy

    src_s = build_sampling("healpix", {"subdivisions": 8, "nest": True})
    dst_s = build_sampling("healpix", {"subdivisions": 4, "nest": True})
    assert native_geom.available()
    Wn, sa, da = native_geom.conservative_weights(src_s, dst_s)
    Wp, _, _ = _conservative_weights_numpy(src_s, dst_s)
    err = abs(Wn - Wp).max()
    print(f"native vs numpy max abs diff: {err:.2e}")
    assert err < 1e-10
    print("self-check OK")
