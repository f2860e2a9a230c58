"""Probabilistic (ensemble) verification.

The reference stubs this out ("TODO probabilistic",
scripts_training/verify_DeepEnsemble.py; SWAG verification uses the
deterministic skills of the ensemble median). Implemented here:

- CRPS (continuous ranked probability score) for ensembles via the
  standard kernel form CRPS = E|X - y| - 0.5 E|X - X'|, with the 'fair'
  (unbiased) M(M-1) variant
- ensemble spread and the spread/skill ratio (calibration diagnostic)
- rank histogram counts

All metrics per (node, leadtime, feature), plus area-weighted global
aggregation compatible with verif.global_summary.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .deterministic import SkillDataset

__all__ = ["crps_ensemble", "ensemble_spread_skill", "rank_histogram",
           "probabilistic"]


def crps_ensemble(members: np.ndarray, obs: np.ndarray,
                  fair: bool = True) -> np.ndarray:
    """CRPS of an ensemble forecast.

    members: [M, ...]; obs: [...]; returns [...] (same shape as obs).
    """
    members = np.asarray(members, dtype=np.float64)
    obs = np.asarray(obs, dtype=np.float64)
    M = members.shape[0]
    if fair and M < 2:
        raise ValueError(
            "fair CRPS needs >= 2 ensemble members (got "
            f"{M}); use fair=False for the biased estimator")
    term1 = np.abs(members - obs[None]).mean(axis=0)
    # pairwise |X - X'| without materializing MxM when M large: sort trick
    # E|X - X'| = 2/M^2 * sum_i (2i - M + 1) * x_(i)   (x sorted ascending)
    xs = np.sort(members, axis=0)
    coef = (2 * np.arange(M) - M + 1).reshape((M,) + (1,) * obs.ndim)
    sum_abs_pairs = 2.0 * (coef * xs).sum(axis=0)   # sum_{i,j} |x_i - x_j|
    denom = M * (M - 1) if fair else M * M
    return term1 - 0.5 * sum_abs_pairs / denom


def ensemble_spread_skill(members: np.ndarray, obs: np.ndarray,
                          axis_time: int = 1) -> Dict[str, np.ndarray]:
    """Spread (ensemble std), RMSE of the ensemble mean, and their ratio.

    members: [M, T, ...]; obs: [T, ...]; aggregates over the time axis.
    """
    mean = members.mean(axis=0)
    spread = np.sqrt(np.maximum(members.var(axis=0, ddof=1), 0)).mean(
        axis=axis_time - 1)
    rmse = np.sqrt(((mean - obs) ** 2).mean(axis=axis_time - 1))
    return {"spread": spread, "RMSE_mean": rmse,
            "spread_skill_ratio": spread / np.where(rmse > 0, rmse, np.nan)}


def rank_histogram(members: np.ndarray, obs: np.ndarray) -> np.ndarray:
    """Counts of the observation's rank within the ensemble -> [M+1]."""
    M = members.shape[0]
    rank = (np.asarray(members) < np.asarray(obs)[None]).sum(axis=0)
    return np.bincount(rank.ravel(), minlength=M + 1)


def probabilistic(ensemble, obs_dataset) -> SkillDataset:
    """Verify an EnsembleForecastDataset: CRPS, spread, spread/skill per
    (leadtime, node, feature)."""
    if list(ensemble.feature_order) != list(obs_dataset.feature_order):
        raise ValueError(
            f"feature order mismatch: ensemble {ensemble.feature_order} vs "
            f"observations {obs_dataset.feature_order} — comparison is "
            f"positional, so skills would score the wrong variables")
    M = ensemble.n_member
    L = ensemble.group["leadtime"].shape[0]
    frt = np.asarray(ensemble.group["forecast_reference_time"][...]).view(
        "datetime64[ns]")
    lt_hours = np.asarray(ensemble.group["leadtime"][...])
    obs_time = obs_dataset.time
    n_frt = len(frt)
    V = len(obs_dataset.lat)
    F = len(ensemble.feature_order)
    # member chunks span (1, n_frt, L, V): slicing one leadtime inside the
    # lt loop would decompress every member chunk L*F times (and a member
    # chunk larger than the LRU chunk cache defeats caching entirely —
    # measured pathological on the 5-member HEALPix-16 protocol ensemble).
    # Preload each (member, feature) array ONCE when the ensemble fits
    # the verification RAM budget (DSW_VERIF_RAM_BYTES, like
    # deterministic()); fall back to per-slice reads beyond it.
    import os

    ram_budget = int(float(os.environ.get("DSW_VERIF_RAM_BYTES", 8e9)))
    preload = M * F * n_frt * L * V * 4 <= ram_budget
    cache = ({(m, n): np.asarray(ensemble.variables[n][m])
              for m in range(M) for n in ensemble.feature_order}
             if preload else None)

    def member_slice(m, n, lt):
        if cache is not None:
            return cache[(m, n)][:, lt, :]
        return ensemble.variables[n][m, :, lt, :]

    skills = {"CRPS": [], "spread": [], "RMSE_mean": [],
              "spread_skill_ratio": []}
    for lt in range(L):
        # rounded-seconds leadtimes: float .astype('timedelta64[h]')
        # TRUNCATES fractional hours (0.5h -> 0h) and would mismatch every
        # sub-hourly observation (same fix as ForecastDataset.valid_time)
        valid = frt + np.round(lt_hours[lt] * 3600.0).astype("timedelta64[s]")
        sidx = np.searchsorted(obs_time, valid)
        ok = sidx < len(obs_time)
        ok &= obs_time[np.minimum(sidx, len(obs_time) - 1)] == valid
        mem = np.stack([
            np.stack([member_slice(m, n, lt)
                      for n in ensemble.feature_order], axis=-1)[ok]
            for m in range(M)])                      # [M, T, V, F]
        obs = obs_dataset.read_stacked(sidx[ok])      # [T, V, F]
        skills["CRPS"].append(crps_ensemble(mem, obs).mean(axis=0))
        ss = ensemble_spread_skill(mem, obs)
        for k in ("spread", "RMSE_mean", "spread_skill_ratio"):
            skills[k].append(ss[k])
    stacked = {k: np.stack(v, axis=0) for k, v in skills.items()}
    return SkillDataset(stacked, lt_hours, obs_dataset.feature_order,
                        lat=obs_dataset.lat, lon=obs_dataset.lon)
