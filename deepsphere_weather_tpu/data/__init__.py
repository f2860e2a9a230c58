"""Data engine: chunked store, labeled datasets, AR indexing, scalers, loaders."""

from .zarrstore import ZarrArray, ZarrGroup, create_group, open_group  # noqa: F401
from .dataset import (
    train_val_test_split_indices,  # noqa: F401
    DatasetView,
    SphericalDataset,
    StaticDataset,
    save_dynamic,
    save_static,
)
from .ar import ARIndexer, check_ar_settings, get_ar_model_tensor_info  # noqa: F401
from .loader import AutoregressiveDataset, AutoregressiveDataLoader  # noqa: F401
from .scalers import (  # noqa: F401
    AnomalyScaler,
    Climatology,
    GlobalMinMaxScaler,
    GlobalStandardScaler,
    SequentialScaler,
    load_scaler,
)
from .toy import generate_toy_data  # noqa: F401
