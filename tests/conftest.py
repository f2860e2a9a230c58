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
os.environ.setdefault("DSW_TPU_CACHE", "/tmp/dsw_tpu_test_cache")

# The axon TPU plugin in this image registers itself regardless of
# JAX_PLATFORMS; jax.config.update before first backend use does win.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
