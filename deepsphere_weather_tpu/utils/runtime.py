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
