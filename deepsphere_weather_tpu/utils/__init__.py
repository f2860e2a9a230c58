"""Utilities: checkpointing, timing, profiling, model summaries."""

from .checkpoint import save_pytree, load_pytree, Checkpointer  # noqa: F401
from .runtime import enable_compilation_cache, set_deterministic_training  # noqa: F401
from .timing import Timer, device_sync  # noqa: F401
from .profiling import (  # noqa: F401
    profile_model,
    profile_step,
    scalability_sweep,
    summarize_model,
)
