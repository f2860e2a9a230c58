"""Ensemble prediction orchestration: SWAG sampling + DeepEnsemble.

Parity with the reference's probabilistic drivers:
- AutoregressiveSWAGPredictions (reference: modules/swag_predictions.py:
  16-168): per member, sample SWAG weights and run AR predictions to a
  member store; then concatenate along a new 'member' dim and write
  ensemble + median stores.
- DeepEnsemble verification flow (reference:
  scripts_training/verify_DeepEnsemble.py:29-172): concat member
  forecasts, median, deterministic verify of the median.

On TPU, members can also be evaluated in parallel by vmapping the model
over stacked member params (SWAG.sample_members) — the sequential member
loop here mirrors the reference semantics and keeps memory bounded for
big rollouts; the vmapped path is used by the benchmark/ensemble engine.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..data.zarrstore import ZarrGroup, create_group
from ..engine.prediction import AutoregressivePredictions, ForecastDataset

__all__ = ["AutoregressiveSWAGPredictions", "build_ensemble_store",
           "ensemble_median", "EnsembleForecastDataset"]


class EnsembleForecastDataset:
    """Per-variable [member, frt, leadtime, node] forecasts."""

    def __init__(self, group: ZarrGroup):
        self.group = group
        self.feature_order = group.attrs["feature_order"]
        self.n_member = group.attrs["n_member"]
        self.variables = {n: group[n] for n in self.feature_order}

    @classmethod
    def open(cls, path):
        return cls(ZarrGroup(path))


def build_ensemble_store(member_forecasts: List[ForecastDataset],
                         out_path) -> EnsembleForecastDataset:
    """Concat member forecast stores along a new leading 'member' dim
    (reference swag_predictions.py:130-150)."""
    f0 = member_forecasts[0]
    M = len(member_forecasts)
    n_frt, L = f0.n_frt, f0.n_leadtime
    V = len(f0.lat)
    g = create_group(out_path, overwrite=True,
                     attrs={"feature_order": list(f0.feature_order),
                            "n_member": M})
    for name in f0.feature_order:
        arr = g.create_array(name, shape=(M, n_frt, L, V),
                             chunks=(1, n_frt, L, V), dtype=np.float32,
                             compressor="zlib")
        for m, fc in enumerate(member_forecasts):
            arr[m] = fc.variables[name][...][None]
    for cname in ("forecast_reference_time", "leadtime", "lat", "lon"):
        src = f0.group[cname]
        a = g.create_array(cname, shape=src.shape, chunks=src.shape,
                           dtype=src.dtype, compressor=None, attrs=src.attrs)
        a[...] = src[...]
    return EnsembleForecastDataset(g)


def ensemble_median(ensemble: EnsembleForecastDataset,
                    out_path) -> ForecastDataset:
    """Member-median forecast store (reference swag_predictions.py:159-166)."""
    g = create_group(out_path, overwrite=True,
                     attrs={"feature_order": list(ensemble.feature_order)})
    for name in ensemble.feature_order:
        data = ensemble.variables[name][...]          # [M, frt, L, V]
        med = np.median(data, axis=0).astype(np.float32)
        arr = g.create_array(name, shape=med.shape,
                             chunks=(1, 1, med.shape[2]), dtype=np.float32,
                             compressor="zlib")
        arr[...] = med
    for cname in ("forecast_reference_time", "leadtime", "lat", "lon"):
        src = ensemble.group[cname]
        a = g.create_array(cname, shape=src.shape, chunks=src.shape,
                           dtype=src.dtype, compressor=None, attrs=src.attrs)
        a[...] = src[...]
    return ForecastDataset(g)


def AutoregressiveSWAGPredictions(
    model,
    swag,
    *,
    rng,
    nb_samples: int = 10,
    sampling_scale: float = 0.1,
    cov: bool = True,
    out_dir,
    # BatchNorm re-estimation after each weight draw (reference
    # swag_predictions.py:59-91 runs bn_update per member): training-period
    # data + AR settings for the stats pass. Ignored for BN-free models.
    bn_update_data: Optional[Dict] = None,
    # forwarded to AutoregressivePredictions
    **predict_kwargs,
) -> Dict[str, object]:
    """For each SWAG sample: draw weights -> [bn_update] -> AR predictions
    -> member zarr; then ensemble + median stores (reference
    swag_predictions.py:16-168)."""
    import jax

    out_dir = Path(out_dir)
    members = []
    keys = jax.random.split(rng, nb_samples)
    for m in range(nb_samples):
        params_m = swag.sample(keys[m], scale=sampling_scale, cov=cov)
        member_kwargs = dict(predict_kwargs)
        if (getattr(model, "has_batch_norm", False)
                and bn_update_data is not None):
            from .bn import bn_update

            member_kwargs["norm_state"] = bn_update(model, params_m,
                                                    **bn_update_data)
        # RAM-backed member datasets (budget-guarded): the ensemble
        # store assembly below then stacks from memory instead of
        # re-reading every member store
        member_kwargs.setdefault("keep_in_memory", True)
        fc = AutoregressivePredictions(
            model, params_m,
            zarr_fpath=out_dir / f"member_{m:02d}.zarr",
            **member_kwargs)
        members.append(fc)
    ensemble = build_ensemble_store(members, out_dir / "ensemble.zarr")
    median = ensemble_median(ensemble, out_dir / "median.zarr")
    return {"members": members, "ensemble": ensemble, "median": median}
