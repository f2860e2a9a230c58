"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is
validated on a host-platform device mesh instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Per-user cache locations: a fixed world-shared /tmp path could be owned
# or pre-populated by another user on a multi-user host (permission
# failures; cache poisoning of deserialized compiled executables).
_cache_root = os.environ.get(
    "XDG_CACHE_HOME", f"/tmp/dsw_cache_uid{os.getuid()}"
)
os.environ.setdefault("DSW_TPU_CACHE", os.path.join(_cache_root, "dsw_tpu_test_cache"))

# The axon TPU plugin in this image registers itself regardless of
# JAX_PLATFORMS; jax.config.update before first backend use does win.
# DSW_TPU_TESTS=1 (the documented `pytest -m tpu` invocation) keeps the
# real backend so the on-hardware kernel gate actually runs on the chip.
import jax  # noqa: E402

if os.environ.get("DSW_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is dominated by CPU compiles
# of the same jitted programs run-to-run; caching them cuts repeat runs
# from ~30 min to minutes. Safe to share across workers (content-addressed).
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_cache_root, "dsw_xla_test_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
