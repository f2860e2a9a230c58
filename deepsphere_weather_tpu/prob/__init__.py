"""Probabilistic layer: SWAG + DeepEnsembles (reference: modules/swag*.py)."""

from .swag import SWAG, SWAGState  # noqa: F401
from .predictions import (  # noqa: F401
    AutoregressiveSWAGPredictions,
    EnsembleForecastDataset,
    build_ensemble_store,
    ensemble_median,
)
