"""Preprocessing pipeline: raw-data ingest, remap to samplings, rechunking.

Parity with the reference's offline pipeline (SURVEY.md §2 L5,
modules/my_io.py, modules/my_remap.py, scripts/01-03c):

- `open_netcdf4`: minimal netCDF4 reader via h5py (netCDF4 files are
  HDF5; the xarray/netCDF4 stack is unavailable in this environment)
- `reformat_pl` / `reformat_toa`: pressure-level unstacking into per-level
  features (z@500 hPa -> 'z500') and TOA accumulation handling
  (reference my_io.py:11-128)
- `remap_to_sampling`: conservative remap of a regular lat/lon field onto
  any framework sampling using the native (C++) polygon-overlap weights —
  this replaces the reference's CDO subprocess remapping
  (my_remap.py:198-337)
- `zarrify_raw_data`: append-mode ingest into the canonical time_chunked
  layout (reference scripts/03c:24-210, chunks {node: -1, time: 24*7})
- `rechunk_to_space_chunked`: time_chunked -> space_chunked copy
  (reference rechunk_Dataset usage, scripts/03c:216-275)
- `check_no_missing_timesteps` (reference xforecasting.utils.io)
"""

from __future__ import annotations

import warnings
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np
from scipy import sparse

from ..sphere import Sampling, build_sampling, compute_interpolation_weights
from ..sphere.cache import cached_arrays
from .dataset import SphericalDataset, save_dynamic
from .zarrstore import ZarrGroup, create_group

__all__ = [
    "open_netcdf4", "reformat_pl", "reformat_toa",
    "remap_weights_for_grid", "remap_to_sampling",
    "remap_grib_files", "get_variable_interp_method", "NATIVE_GRIDS",
    "zarrify_raw_data", "rechunk_to_space_chunked",
    "check_no_missing_timesteps",
]


def open_netcdf4(path) -> Dict[str, np.ndarray]:
    """Read a netCDF4 (HDF5) file into {name: array} + dim metadata.

    Returns dict with variables plus '__dims__' mapping var -> dim names.
    """
    import h5py

    out: Dict[str, np.ndarray] = {}
    dims: Dict[str, tuple] = {}
    with h5py.File(path, "r") as f:
        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                out[name] = obj[...]
                dl = obj.attrs.get("_Netcdf4Coordinates")
                dn = obj.attrs.get("DIMENSION_LIST")
                if dn is not None:
                    try:
                        dims[name] = tuple(
                            f[ref[0]].name.strip("/") for ref in dn)
                    except Exception:
                        pass
        f.visititems(visit)
    out["__dims__"] = dims
    return out


def reformat_pl(data: Dict[str, np.ndarray], plev_name: str = "level",
                var_levels: Optional[Dict[str, Sequence[int]]] = None
                ) -> Dict[str, np.ndarray]:
    """Unstack pressure levels into per-level features: z + 500 -> 'z500'
    (reference my_io.py:11-81). Input arrays are [time, level, ...]."""
    levels = np.asarray(data.get(plev_name, []), dtype=np.int64)
    dims = data.get("__dims__", {})
    out = {}
    for name, arr in data.items():
        if name.startswith("__") or name == plev_name:
            continue
        arr = np.asarray(arr)
        # a variable is level-stacked when its SECOND DIM IS the level
        # dimension — by name when netCDF dimension metadata is available
        # (a surface var whose second dim merely has the same length must
        # not be unstacked), by length otherwise
        var_dims = dims.get(name)
        if var_dims is not None:
            stacked = len(var_dims) >= 2 and var_dims[1] == plev_name
        else:
            stacked = arr.ndim >= 2 and len(levels) and \
                arr.shape[1] == len(levels)
        if stacked:
            wanted = (var_levels or {}).get(name, levels)
            for lv in wanted:
                li = int(np.nonzero(levels == lv)[0][0])
                # hPa naming convention: z500, t850 ...
                out[f"{name}{int(lv)}"] = arr[:, li]
        else:
            out[name] = arr
    return out


def reformat_toa(tisr: np.ndarray, accumulation_hours: int = 1) -> np.ndarray:
    """De-accumulate TOA incident solar radiation to W/m^2
    (reference my_io.py:84-128: ERA5 tisr is J/m^2 accumulated)."""
    return np.asarray(tisr, dtype=np.float64) / (accumulation_hours * 3600.0)


# ---------------------------------------------------------------------------
# Remapping (CDO replacement)
# ---------------------------------------------------------------------------

# Per-variable interpolation method (reference my_remap.py:73-87):
# categorical fields must NOT be averaged — the cell takes the value of
# the source cell with the largest area overlap.
_VARIABLE_INTERP_METHOD = {
    "dynamic_variables": "conservative",
    "topography": "conservative",
    "orog": "conservative",
    "land_sea_mask": "conservative",
    "lsm": "conservative",
    "soil_type": "largest_area_fraction",
    "slt": "largest_area_fraction",
}

# dataset -> native grid registry (reference my_remap.py:32-42)
NATIVE_GRIDS = {
    "ERA5_HRES": "N320",
    "ERA5_EDA": "N160",
    "IFS_HRES": "O1280",
    "IFS_ENS": "O640",
    "IFS_ENS_Extended": "O320",
    "SEAS5": "O320",
}


def get_variable_interp_method(variable: str) -> str:
    """Interpolation method for a variable (reference my_remap.py:84-87);
    unknown variables are treated as continuous (conservative)."""
    return _VARIABLE_INTERP_METHOD.get(variable, "conservative")


def remap_weights_for_grid(nlat: int, nlon: int, dst: Sampling,
                           cache: bool = True,
                           method: str = "conservative"
                           ) -> sparse.csr_matrix:
    """Remap weights from a regular lat/lon grid to a sampling.

    The source grid is modeled as the framework's 'equiangular' sampling
    (cell-centered); see `remap_weights_for_source` for arbitrary source
    samplings (reduced Gaussian GRIB grids etc.).
    """
    src = build_sampling("equiangular", {"nlat": nlat, "nlon": nlon})
    return remap_weights_for_source(src, dst, cache=cache, method=method)


def remap_weights_for_source(src: Sampling, dst: Sampling,
                             cache: bool = True,
                             method: str = "conservative"
                             ) -> sparse.csr_matrix:
    """Remap weights from ANY source sampling to a destination sampling.

    method='conservative' gives fracarea-normalized rows (dst x src);
    method='largest_area_fraction' gives one-hot rows picking the source
    cell with the biggest overlap (categorical fields — the reference
    delegates this to CDO remaplaf, my_remap.py:75-88). Cached on disk
    like the reference caches CDO weight files (my_remap.py:198-337).
    """
    if method not in ("conservative", "largest_area_fraction"):
        raise ValueError(f"unknown remap method {method!r}")

    def _build():
        W, _, _ = compute_interpolation_weights(src, dst,
                                                normalization="fracarea")
        W = W.tocsr()
        return {"data": W.data, "indices": W.indices, "indptr": W.indptr,
                "shape": np.asarray(W.shape)}

    key = f"remapw_{src.cache_key()}__{dst.cache_key()}"
    arrs = cached_arrays(key, _build) if cache else _build()
    W = sparse.csr_matrix((arrs["data"], arrs["indices"], arrs["indptr"]),
                          shape=tuple(arrs["shape"]))
    if method == "largest_area_fraction":
        # one-hot argmax per destination row: fracarea weights order
        # overlap fractions, so the row argmax IS the largest-area source.
        # Rows with NO overlap stay empty (remapping to 0) instead of
        # silently inheriting source cell 0's categorical value.
        rows, cols = [], []
        for d in range(W.shape[0]):
            lo, hi = W.indptr[d], W.indptr[d + 1]
            if hi > lo:
                rows.append(d)
                cols.append(W.indices[lo + np.argmax(W.data[lo:hi])])
        W = sparse.csr_matrix(
            (np.ones(len(rows), dtype=np.float64), (rows, cols)),
            shape=W.shape)
    return W


def remap_to_sampling(field: np.ndarray, dst: Sampling,
                      weights: Optional[sparse.csr_matrix] = None,
                      method: str = "conservative") -> np.ndarray:
    """Remap onto a sampling's nodes along the trailing spatial axes.

    Accepts [..., nlat, nlon] regular-grid fields (weights built from the
    equiangular model when not given) or [..., n_points] flat fields
    (reduced-Gaussian GRIB sources; `weights` then mandatory). Leading
    axes (time, level, ...) are preserved.
    """
    field = np.asarray(field)
    if weights is not None and field.shape[-1] == weights.shape[1]:
        lead = field.shape[:-1]
        flat = field.reshape(-1, field.shape[-1])
    else:
        if field.ndim < 2:
            raise ValueError(f"field rank {field.ndim} < 2")
        nlat, nlon = field.shape[-2:]
        lead = field.shape[:-2]
        if weights is None:
            weights = remap_weights_for_grid(nlat, nlon, dst, method=method)
        if nlat * nlon != weights.shape[1]:
            raise ValueError(
                f"field spatial size {nlat}x{nlon} != weight columns "
                f"{weights.shape[1]}")
        flat = field.reshape(-1, nlat * nlon)
    out = np.asarray((weights @ flat.T).T, dtype=np.float32)
    out = out.reshape(lead + (weights.shape[0],))
    return out


# static variables the reference remaps file-per-file
# (reference my_remap.py:56-63 get_available_static_variables)
STATIC_VARIABLES = ("topography", "land_sea_mask", "soil_type")


def _default_grib_reader(path):
    """Read one GRIB file.

    Prefers the cfgrib/eccodes stack when installed (full parameter-table
    coverage); falls back to the framework's self-contained GRIB2 codec
    (data/grib.py — regular/reduced Gaussian + regular lat/lon, simple
    packing), which returns the parsed grid geometry as a third element
    so reduced-Gaussian sources remap with their true cell layout.
    """
    try:
        import cfgrib  # noqa: F401
        import xarray as xr
    except ImportError:
        from .grib import read_grib2
        return read_grib2(path)
    ds = xr.open_dataset(path, engine="cfgrib")
    fields = {}
    for name in ds.data_vars:
        arr = np.asarray(ds[name].values, dtype=np.float32)
        fields[name] = arr[None] if arr.ndim == 2 else arr
    time = np.atleast_1d(np.asarray(ds["time"].values, dtype="datetime64[ns]")
                         ) if "time" in ds else None
    return fields, time


def _source_spec(grid, native_name: str):
    """Validate a file-carried grid against the dataset registry's declared
    native grid and return it as a source Sampling. N-grids (classic
    reduced Gaussian, tabulated pl) validate nlat only — their exact pl
    comes from the file; O/F grids validate the full geometry."""
    from .grib import GridSpec

    try:
        expect = GridSpec.from_name(native_name)
    except (ValueError, IndexError):
        expect = None
    if expect is not None:
        if grid.nlat != expect.nlat:
            raise ValueError(
                f"GRIB grid has {grid.nlat} Gaussian latitudes but the "
                f"dataset registry declares {native_name} "
                f"({expect.nlat} latitudes)")
        if expect.pl is not None and grid.pl is not None \
                and tuple(grid.pl) != tuple(expect.pl):
            raise ValueError(
                f"GRIB pl row lengths do not match the declared "
                f"{native_name} layout")
    return grid.to_sampling()


def _load_or_build_weights(weights_dir, method: str, src, dst: Sampling,
                           src_name: str, dst_name: str) -> sparse.csr_matrix:
    """Per-(method, src, dst) weight FILE cache, like the reference's CDO
    weight files (my_remap.py:320-330 get_cdo_weights_filename +
    precompute_weights). `src` is a (nlat, nlon) regular-grid shape or a
    Sampling (reduced-Gaussian GRIB source geometry)."""
    weights_dir = Path(weights_dir)
    weights_dir.mkdir(parents=True, exist_ok=True)
    fname = f"weights_{method}_{src_name}_{dst_name}.npz"
    fpath = weights_dir / fname
    n_src = (src.n_nodes if isinstance(src, Sampling)
             else int(src[0]) * int(src[1]))
    if fpath.exists():
        z = np.load(fpath)
        # a name collision (same src/dst names, different grid shape or
        # sampling parameters) must rebuild, not silently reuse: stale
        # weights shaped like the current operands would remap WRONG
        want = (dst.n_nodes, n_src)
        if tuple(z["shape"]) == want:
            return sparse.csr_matrix((z["data"], z["indices"], z["indptr"]),
                                     shape=tuple(z["shape"]))
        warnings.warn(
            f"stale remap-weight cache {fname}: stored shape "
            f"{tuple(int(x) for x in z['shape'])} != expected {want} "
            "(different source grid or destination sampling under the same "
            "names) — rebuilding", stacklevel=2)
    if isinstance(src, Sampling):
        W = remap_weights_for_source(src, dst, cache=False, method=method)
    else:
        W = remap_weights_for_grid(int(src[0]), int(src[1]), dst,
                                   cache=False, method=method)
    np.savez_compressed(fpath, data=W.data, indices=W.indices,
                        indptr=W.indptr, shape=np.asarray(W.shape))
    return W


def remap_grib_files(data_dir, dataset: str, sampling_name: str,
                     variable_type: str, dst: Sampling,
                     weights_dir=None, force_remapping: bool = False,
                     reader=None, verbose: bool = True) -> List[Path]:
    """Batch GRIB -> sampling remap driver (reference my_remap.py:198-337).

    Mirrors the reference's directory contract: inputs under
    ``<data_dir>/<dataset>/<native_grid>/<variable_type>/<variable>/**/*.grib``
    are remapped onto `dst` and written to the same tree with
    ``<native_grid>`` replaced by `sampling_name` and extension ``.npz``
    (the reference writes netCDF via CDO; this framework's canonical
    ingest consumes arrays, so outputs are {var: [T, node], time} npz
    ready for `zarrify_raw_data`). Reproduced behaviors:

    - per-variable interpolation method (conservative for continuous
      fields, largest_area_fraction for categoricals — my_remap.py:75-88)
    - per-(method, src-grid, dst-sampling) weight-file caching
      (my_remap.py:320-330), default ``<data_dir>/weights/``
    - skip-already-remapped outputs unless `force_remapping`
      (my_remap.py:303-313)
    - static vs dynamic variable sets (my_remap.py:281-284)

    `reader(path) -> ({var: [T, nlat, nlon]}, time)` defaults to the
    cfgrib/xarray stack (optional dependency, gated with a clear error);
    tests inject a synthetic reader. Returns the written output paths.
    """
    if variable_type not in ("static", "dynamic"):
        raise ValueError("variable_type must be 'static' or 'dynamic'")
    if dataset not in NATIVE_GRIDS:
        raise ValueError(f"unknown dataset {dataset!r}; one of "
                         f"{sorted(NATIVE_GRIDS)}")
    data_dir = Path(data_dir)
    native = NATIVE_GRIDS[dataset]
    if weights_dir is None:
        weights_dir = data_dir / "weights"
    if reader is None:
        reader = _default_grib_reader

    variables = (list(STATIC_VARIABLES) if variable_type == "static"
                 else ["dynamic_variables"])
    written: List[Path] = []
    for variable in variables:
        src_dir = data_dir / dataset / native / variable_type / variable
        dst_dir = data_dir / dataset / sampling_name / variable_type / variable
        src_fpaths = sorted(src_dir.glob("**/*.grib"))
        if not src_fpaths:
            if verbose:
                print(f"{variable} data are not available")
            continue
        if verbose:
            print(f"Remapping {variable} from {native} to {sampling_name}")
        dst_fpaths = [dst_dir / p.relative_to(src_dir).with_suffix(".npz")
                      for p in src_fpaths]
        if not force_remapping:
            keep = [not d.exists() for d in dst_fpaths]
            src_fpaths = [s for s, k in zip(src_fpaths, keep) if k]
            dst_fpaths = [d for d, k in zip(dst_fpaths, keep) if k]
            if not src_fpaths:
                if verbose:
                    print("Data were already remapped. Set "
                          "force_remapping=True to force remapping.")
                continue
        method = get_variable_interp_method(variable)
        weights = None
        for src_fp, dst_fp in zip(src_fpaths, dst_fpaths):
            res = reader(src_fp)
            fields, time = res[0], res[1]
            # 3-element readers (the native GRIB2 codec) return the parsed
            # grid geometry: reduced-Gaussian sources then remap with
            # their true cell layout instead of a regular-grid model
            src_spec = (_source_spec(res[2], native)
                        if len(res) > 2 and res[2] is not None else None)
            out: Dict[str, np.ndarray] = {}
            for name, field in fields.items():
                if name == "level":          # level coordinate: passthrough
                    out[name] = np.asarray(field)
                    continue
                field = np.asarray(field, dtype=np.float32)
                if src_spec is None and field.ndim == 2:
                    field = field[None]
                src = (src_spec if src_spec is not None
                       else field.shape[-2:])
                # dynamic_variables folders hold multi-variable files; the
                # method is still per-VARIABLE inside them (reference
                # get_variable_interp_method falls through to the name)
                m = (get_variable_interp_method(name)
                     if variable == "dynamic_variables" else method)
                if m == method:
                    if weights is None:
                        weights = _load_or_build_weights(
                            weights_dir, method, src, dst,
                            native, sampling_name)
                    W = weights
                else:
                    W = _load_or_build_weights(
                        weights_dir, m, src, dst,
                        native, sampling_name)
                out[name] = remap_to_sampling(field, dst, weights=W)
            dst_fp.parent.mkdir(parents=True, exist_ok=True)
            payload = dict(out, lat=dst.lat, lon=dst.lon)
            if time is not None:
                payload["time"] = np.asarray(time).view(np.int64)
            np.savez_compressed(dst_fp, **payload)
            written.append(dst_fp)
    return written


# ---------------------------------------------------------------------------
# Ingest + rechunk
# ---------------------------------------------------------------------------

def zarrify_raw_data(out_path, batches, time_chunk: int = 24 * 7,
                     lat=None, lon=None, compressor="zlib") -> SphericalDataset:
    """Append-mode ingest: iterate over (variables_dict, time_array) batches
    and write the canonical time_chunked store (reference scripts/03c:91-163).

    `compressor`: "zlib" (default, no system deps), "blosc:zstd"/"blosc:lz4"
    (the reference's store codecs, scripts/03c:320-331), or None.
    """
    out_path = Path(out_path)
    first = True
    for variables, time in batches:
        time = np.asarray(time, dtype="datetime64[ns]")
        if first:
            save_dynamic(out_path, variables, time=time, lat=lat, lon=lon,
                         time_chunk=time_chunk, compressor=compressor,
                         overwrite=True)
            first = False
        else:
            g = ZarrGroup(out_path)
            for name, arr in variables.items():
                g[name].append(np.asarray(arr, dtype=np.float32), axis=0)
            g["time"].append(time.view(np.int64), axis=0)
    ds = SphericalDataset(ZarrGroup(out_path))
    check_no_missing_timesteps(ds.time)
    return ds


def rechunk_to_space_chunked(src_path, dst_path,
                             node_chunk: int = 1) -> SphericalDataset:
    """time_chunked {time: C, node: -1} -> space_chunked {time: -1, node: c}
    copy for per-node access patterns (reference scripts/03c:216-275)."""
    src = SphericalDataset(ZarrGroup(src_path))
    g = create_group(dst_path, overwrite=True,
                     attrs={"feature_order": src.feature_order})
    T, V = src.n_time, src.n_node
    for name in src.feature_order:
        arr = g.create_array(name, shape=(T, V),
                             chunks=(T, max(node_chunk, 1)),
                             dtype=np.float32, compressor="zlib")
        arr[...] = src.variables[name][...]
    t = g.create_array("time", shape=(T,), chunks=(T,), dtype=np.int64,
                       compressor=None)
    t[...] = np.asarray(src.time, dtype="datetime64[ns]").view(np.int64)
    for cname in ("lat", "lon"):
        val = getattr(src, cname)
        if val is not None:
            c = g.create_array(cname, shape=(V,), chunks=(V,),
                               dtype=np.float64, compressor=None)
            c[...] = val
    return SphericalDataset(ZarrGroup(dst_path))


def check_no_missing_timesteps(time: np.ndarray):
    """Raise if the time axis has gaps (reference
    xforecasting.utils.io.check_no_missing_timesteps, scripts/03c:100)."""
    time = np.asarray(time, dtype="datetime64[ns]")
    if len(time) < 2:
        return
    dt = np.diff(time)
    if not np.all(dt == dt[0]):
        bad = np.nonzero(dt != dt[0])[0]
        raise ValueError(
            f"missing/irregular timesteps after indices {bad[:5]} "
            f"(expected step {dt[0]})")
