"""JAX runtime settings shared by the CLI drivers and benchmark harnesses.

The reference centralizes torch runtime knobs (device, determinism, cuDNN
benchmark, numeric precision) in ``set_pytorch_settings``
(reference: modules/utils_config.py:432-473). The TPU-native equivalents are
mostly structural (PRNG-key determinism lives in the engine; precision is the
model's ``numeric_precision``), but one knob matters operationally on TPU:
the **persistent XLA compilation cache**. First compilation of the jitted
train/rollout steps or the Pallas kernels takes tens of seconds to minutes;
caching compiled executables on disk makes every later process start warm.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT_CACHE = "~/.cache/deepsphere_weather_tpu/xla"
_enabled_dir: str | None = None


def set_deterministic_training(enabled: bool, seed: int = 0) -> bool:
    """TPU-native equivalent of the reference's ``set_pytorch_deterministic``
    (reference: modules/utils_config.py:444-455; xforecasting.utils.torch).

    JAX computation is already deterministic given fixed PRNG keys, so the
    two things this knob actually controls here are:

    - **host-side global RNGs** (``random``, ``np.random``): seeded so any
      library code drawing from the global streams (plot jitter, worker
      shuffles outside the explicitly-seeded loader) is reproducible;
    - **partitionable threefry**: ``jax_threefry_partitionable=True`` makes
      ``jax.random`` draws independent of the device mesh/sharding, so a
      "deterministic" run reproduces bit-identically when the chip count
      changes — the TPU analog of turning off cuDNN autotune nondeterminism.

    Returns ``enabled`` for convenience. When ``enabled`` is False this is a
    no-op (matching the reference, which only acts on the True branch).
    """
    if not enabled:
        return False
    import random

    import numpy as np

    random.seed(int(seed))
    np.random.seed(int(seed) % (2**32))
    try:
        import jax

        jax.config.update("jax_threefry_partitionable", True)
    except Exception:
        pass
    return True


def enable_compilation_cache(cache_dir: str | os.PathLike | None = None) -> str:
    """Enable JAX's persistent compilation cache (idempotent).

    Resolution order: explicit ``cache_dir`` argument, the
    ``DSW_COMPILE_CACHE`` environment variable, then
    ``~/.cache/deepsphere_weather_tpu/xla``. Setting ``DSW_COMPILE_CACHE=0``
    (or ``off``/``none``) disables the cache entirely.

    Only the ``cpu`` and ``tpu`` backends get the cache by default:
    experimental/proxy backends (e.g. a tunneled chip) have been observed
    to hang while deserializing large cached executables, which is worse
    than recompiling. Pass ``cache_dir`` or set ``DSW_COMPILE_CACHE`` to
    force the cache on such a backend anyway.

    Returns the cache directory in use ("" when disabled). Safe to call
    before or after backend initialization and on any backend; failures
    (e.g. a read-only filesystem) degrade to uncached compilation.
    """
    global _enabled_dir
    env = os.environ.get("DSW_COMPILE_CACHE", "")
    if cache_dir is None:
        if env.lower() in ("0", "off", "none", "false"):
            return ""
        if not env:
            import jax

            if jax.default_backend() not in ("cpu", "tpu"):
                return ""
        cache_dir = env or _DEFAULT_CACHE
    path = str(Path(cache_dir).expanduser())
    if _enabled_dir == path:
        return path
    try:
        Path(path).mkdir(parents=True, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything that took meaningful compile time; the jitted AR
        # steps and Pallas SpMM kernels all clear this bar.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _enabled_dir = path
    except Exception:
        return ""
    return path
