"""AR engines: jitted training steps, rollout prediction, schedulers."""

from .loss import AreaWeights, weighted_mse  # noqa: F401
from .scheduler import ARScheduler, EarlyStopping  # noqa: F401
from .step import (  # noqa: F401
    assemble_input,
    make_ar_loss_fn,
    make_context,
    make_member_train_step,
    make_rollout_block,
    make_train_step,
    make_validation_fn,
)
from .training import ARTrainingInfo, AutoregressiveTraining  # noqa: F401
from .prediction import (  # noqa: F401
    AutoregressivePredictions,
    ForecastDataset,
    rechunk_forecasts_for_verification,
)
