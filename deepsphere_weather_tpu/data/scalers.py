"""Scalers and climatology — the xscaler layer (SURVEY.md §2.10).

Reimplements the external `xscaler` API surface the reference trains with
(reference call sites: scripts/04a_compute_scalers.py:42-384,
scripts_training/train_predict_state.py:205-212):

- GlobalStandardScaler / GlobalMinMaxScaler (per-feature global stats)
- AnomalyScaler (per time-group x node x feature mean, optionally
  standardized) for month / weekofyear / dayofyear / hour groupings
- Climatology with mean + variability and `.forecast(times)`
- SequentialScaler composition
- load_scaler() for any saved scaler

Scalers operate on stacked [time, node, feature] float arrays + their
datetime64 time coordinate and the feature-name list; fitting streams over
a SphericalDataset. Persistence is .npz + JSON header (netCDF is not
available in this environment; format documented in the file header).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

__all__ = [
    "GlobalStandardScaler", "GlobalMinMaxScaler", "AnomalyScaler",
    "Climatology", "SequentialScaler", "load_scaler",
    "time_group_indices",
]

_NS = "datetime64[ns]"


_GROUP_SIZES = {"month": 12, "weekofyear": 53, "dayofyear": 366, "hour": 24}


def _group_sizes(time_groups) -> int:
    """Total group count; compound groupings (e.g. ['hour', 'month'] for
    the reference's HourlyMonthly scalers, scripts/04a:355) multiply."""
    if isinstance(time_groups, str):
        return _GROUP_SIZES[time_groups]
    n = 1
    for g in time_groups:
        n *= _GROUP_SIZES[g]
    return n


def _single_group_indices(idx: pd.DatetimeIndex, group: str) -> np.ndarray:
    if group == "month":
        return idx.month.to_numpy() - 1
    if group == "weekofyear":
        return idx.isocalendar().week.to_numpy().astype(np.int64) - 1
    if group == "dayofyear":
        return idx.dayofyear.to_numpy() - 1
    if group == "hour":
        return idx.hour.to_numpy()
    raise ValueError(f"unknown time_groups {group!r}")


def time_group_indices(time: np.ndarray, time_groups) -> np.ndarray:
    """0-based group index per timestamp.

    `time_groups` is a single rule name or a sequence of them; compound
    groupings use a mixed-radix index (xscaler time_groups=[...] parity,
    e.g. ['hour', 'month'] -> 24*12 groups).
    """
    idx = pd.DatetimeIndex(np.asarray(time, dtype=_NS))
    if isinstance(time_groups, str):
        return _single_group_indices(idx, time_groups)
    out = np.zeros(len(idx), dtype=np.int64)
    for g in time_groups:
        out = out * _GROUP_SIZES[g] + _single_group_indices(idx, g)
    return out


class _BaseScaler:
    kind = "base"

    def transform(self, x: np.ndarray, time=None) -> np.ndarray:
        raise NotImplementedError

    def inverse_transform(self, x: np.ndarray, time=None) -> np.ndarray:
        raise NotImplementedError

    # -- persistence -----------------------------------------------------
    def _state(self) -> Tuple[Dict, Dict]:
        raise NotImplementedError

    def save(self, path):
        header, arrays = self._state()
        header["kind"] = self.kind
        np.savez_compressed(Path(path), __header__=json.dumps(header), **arrays)

    @staticmethod
    def _load_state(path):
        with np.load(Path(path), allow_pickle=False) as z:
            header = json.loads(str(z["__header__"]))
            arrays = {k: z[k] for k in z.files if k != "__header__"}
        return header, arrays


class GlobalStandardScaler(_BaseScaler):
    """Per-feature global standardization (xscaler.GlobalStandardScaler)."""

    kind = "global_standard"

    def __init__(self, mean=None, std=None, feature_order: Optional[List[str]] = None):
        self.mean = mean
        self.std = std
        self.feature_order = feature_order

    def fit(self, data: np.ndarray, feature_order=None) -> "GlobalStandardScaler":
        """data: [T, V, F] (fits over time and node). Constant features
        (std 0) scale by 1 so transform stays finite."""
        # float64 ACCUMULATORS, not post-hoc casts: naive float32
        # summation over a [T, V, F] HEALPix-64 block measured 46% mean
        # error (29165 vs 54262 for z500) — the strided axis-(0,1)
        # reduction does not get numpy's pairwise protection
        self.mean = data.mean(axis=(0, 1), dtype=np.float64)
        std = data.std(axis=(0, 1), dtype=np.float64)
        self.std = np.where(std > 0, std, 1.0)
        self.feature_order = feature_order
        return self

    def fit_dataset(self, ds, chunk: int = 1024) -> "GlobalStandardScaler":
        """Streaming fit over a SphericalDataset (constant memory)."""
        n, s1, s2 = 0, 0.0, 0.0
        for lo in range(0, ds.n_time, chunk):
            block = ds.read_stacked(np.arange(lo, min(lo + chunk, ds.n_time)))
            x = block.reshape(-1, block.shape[-1]).astype(np.float64)
            n += x.shape[0]
            s1 = s1 + x.sum(axis=0)
            s2 = s2 + (x ** 2).sum(axis=0)
        self.mean = s1 / n
        std = np.sqrt(np.maximum(s2 / n - self.mean ** 2, 0))
        self.std = np.where(std > 0, std, 1.0)
        self.feature_order = list(ds.feature_order)
        return self

    def transform(self, x, time=None):
        return (x - self.mean) / self.std

    def inverse_transform(self, x, time=None):
        return x * self.std + self.mean

    def _state(self):
        return ({"feature_order": self.feature_order},
                {"mean": self.mean, "std": self.std})

    @classmethod
    def _from_state(cls, header, arrays):
        return cls(mean=arrays["mean"], std=arrays["std"],
                   feature_order=header.get("feature_order"))


class GlobalMinMaxScaler(_BaseScaler):
    """Per-feature min-max scaling to [0, 1] (xscaler.GlobalMinMaxScaler)."""

    kind = "global_minmax"

    def __init__(self, vmin=None, vmax=None, feature_order=None):
        self.vmin, self.vmax = vmin, vmax
        self.feature_order = feature_order

    def fit(self, data: np.ndarray, feature_order=None):
        self.vmin = data.min(axis=(0, 1)).astype(np.float64)
        self.vmax = data.max(axis=(0, 1)).astype(np.float64)
        self.feature_order = feature_order
        return self

    def fit_dataset(self, ds, chunk: int = 1024):
        vmin = np.full(ds.n_feature, np.inf)
        vmax = np.full(ds.n_feature, -np.inf)
        for lo in range(0, ds.n_time, chunk):
            block = ds.read_stacked(np.arange(lo, min(lo + chunk, ds.n_time)))
            vmin = np.minimum(vmin, block.min(axis=(0, 1)))
            vmax = np.maximum(vmax, block.max(axis=(0, 1)))
        self.vmin, self.vmax = vmin, vmax
        self.feature_order = list(ds.feature_order)
        return self

    def _range(self):
        d = np.asarray(self.vmax) - np.asarray(self.vmin)
        # constant features (zero range) scale by 1 to stay finite
        return np.where(d > 0, d, 1.0)

    def transform(self, x, time=None):
        return (x - self.vmin) / self._range()

    def inverse_transform(self, x, time=None):
        return x * self._range() + self.vmin

    def _state(self):
        return ({"feature_order": self.feature_order},
                {"vmin": self.vmin, "vmax": self.vmax})

    @classmethod
    def _from_state(cls, header, arrays):
        return cls(vmin=arrays["vmin"], vmax=arrays["vmax"],
                   feature_order=header.get("feature_order"))


class AnomalyScaler(_BaseScaler):
    """Per time-group, per-node anomaly scaler (xscaler.AnomalyScaler).

    transform subtracts the group/node/feature climatological mean; if
    standardized=True also divides by the group std (reference scalers:
    MonthlyStdAnomalyScaler etc., scripts/04a:…).
    """

    kind = "anomaly"

    def __init__(self, time_groups="month", standardized: bool = True,
                 mean=None, std=None, feature_order=None,
                 reference_period: Optional[Tuple[str, str]] = None):
        self.time_groups = time_groups
        self.standardized = standardized
        self.mean = mean          # [G, V, F]
        self.std = std
        self.feature_order = feature_order
        self.reference_period = reference_period
        self.fitted = None        # [G] bool mask of groups seen at fit

    def fit(self, data: np.ndarray, time: np.ndarray, feature_order=None):
        time = np.asarray(time, dtype=_NS)
        if self.reference_period is not None:
            lo = np.datetime64(self.reference_period[0])
            hi = np.datetime64(self.reference_period[1])
            sel = (time >= lo) & (time < hi)
            data, time = data[sel], time[sel]
        G = _group_sizes(self.time_groups)
        gidx = time_group_indices(time, self.time_groups)
        T, V, F = data.shape
        mean = np.zeros((G, V, F))
        std = np.ones((G, V, F))
        fitted = np.zeros(G, dtype=bool)
        for g in range(G):
            sel = gidx == g
            if sel.any():
                fitted[g] = True
                mean[g] = data[sel].mean(axis=0, dtype=np.float64)
                s = data[sel].std(axis=0, dtype=np.float64)
                std[g] = np.where(s > 0, s, 1.0)
        self.mean, self.std = mean, std
        self.fitted = fitted
        self.feature_order = feature_order
        return self

    def _check_groups(self, g):
        """Transforming a time group absent from the fit data would
        silently return the RAW field (mean 0 / std 1) — error instead."""
        if getattr(self, "fitted", None) is None:
            return
        bad = np.unique(np.asarray(g)[~self.fitted[np.asarray(g)]])
        if bad.size:
            raise ValueError(
                f"AnomalyScaler({self.time_groups!r}): time group(s) "
                f"{bad.tolist()} were absent from the fit data "
                f"(reference_period={self.reference_period}); cannot "
                f"transform timestamps in those groups")

    def _groups(self, time):
        return time_group_indices(np.asarray(time, dtype=_NS), self.time_groups)

    def transform(self, x, time=None):
        g = self._groups(time)
        self._check_groups(g)
        out = x - self.mean[g]
        if self.standardized:
            out = out / self.std[g]
        return out

    def inverse_transform(self, x, time=None):
        g = self._groups(time)
        self._check_groups(g)
        out = x * self.std[g] if self.standardized else x
        return out + self.mean[g]

    def _state(self):
        arrays = {"mean": self.mean, "std": self.std}
        if getattr(self, "fitted", None) is not None:
            arrays["fitted"] = self.fitted
        return ({"time_groups": self.time_groups,
                 "standardized": self.standardized,
                 "feature_order": self.feature_order,
                 "reference_period": list(self.reference_period)
                 if self.reference_period else None},
                arrays)

    @classmethod
    def _from_state(cls, header, arrays):
        obj = cls(time_groups=header["time_groups"],
                  standardized=header["standardized"],
                  mean=arrays["mean"], std=arrays["std"],
                  feature_order=header.get("feature_order"),
                  reference_period=tuple(header["reference_period"])
                  if header.get("reference_period") else None)
        if "fitted" in arrays:   # older files: assume all groups fitted
            obj.fitted = arrays["fitted"].astype(bool)
        return obj


class Climatology(AnomalyScaler):
    """Climatology = group mean (+ variability); adds `.forecast(times)`
    (xscaler.Climatology, used by scripts/05_compute_verif_benchmarks.py:54)."""

    kind = "climatology"

    def forecast(self, times: np.ndarray) -> np.ndarray:
        """Climatological forecast fields at the given times -> [T, V, F]."""
        g = self._groups(times)
        return self.mean[g].astype(np.float32)


class SequentialScaler(_BaseScaler):
    """Composition of scalers applied in order (xscaler.SequentialScaler,
    reference train_predict_state.py:205-212)."""

    kind = "sequential"

    def __init__(self, *scalers):
        self.scalers = list(scalers)

    def transform(self, x, time=None):
        for s in self.scalers:
            x = s.transform(x, time=time)
        return x

    def inverse_transform(self, x, time=None):
        for s in reversed(self.scalers):
            x = s.inverse_transform(x, time=time)
        return x

    def save(self, path):
        path = Path(path)
        header = {"kind": self.kind, "n": len(self.scalers)}
        path.mkdir(parents=True, exist_ok=True)
        (path / "header.json").write_text(json.dumps(header))
        for i, s in enumerate(self.scalers):
            s.save(path / f"scaler_{i}.npz")

    @classmethod
    def load(cls, path):
        path = Path(path)
        header = json.loads((path / "header.json").read_text())
        return cls(*[load_scaler(path / f"scaler_{i}.npz")
                     for i in range(header["n"])])


_KINDS = {
    "global_standard": GlobalStandardScaler,
    "global_minmax": GlobalMinMaxScaler,
    "anomaly": AnomalyScaler,
    "climatology": Climatology,
}


def load_scaler(path):
    """Load any saved scaler (xscaler.LoadScaler/LoadAnomaly/LoadClimatology)."""
    path = Path(path)
    if path.is_dir() and (path / "header.json").exists():
        return SequentialScaler.load(path)
    header, arrays = _BaseScaler._load_state(path)
    cls = _KINDS[header["kind"]]
    return cls._from_state(header, arrays)
