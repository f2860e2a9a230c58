"""On-hardware kernel regression tests (`pytest -m tpu`).

The default suite pins JAX to a virtual CPU mesh (conftest.py), where the
Pallas BCSR kernels run only in interpreter mode. These tests validate the
COMPILED kernels — run them on a TPU host with:

    JAX_PLATFORMS='' DSW_TPU_TESTS=1 python -m pytest -m tpu tests/test_tpu_hw.py

(bench.py runs the same gate before every timing, so a Mosaic miscompile
also fails the benchmark line; scripts/validate_tpu_kernels.py is the
wider manual sweep.)
"""

import os

import pytest


@pytest.mark.tpu
@pytest.mark.skipif(os.environ.get("DSW_TPU_TESTS") != "1",
                    reason="set DSW_TPU_TESTS=1 on a TPU host (the suite "
                           "conftest pins JAX to CPU, where compiled "
                           "kernels cannot run)")
def test_compiled_bcsr_kernel_parity():
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("no TPU backend available")
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import kernel_parity

    parity = kernel_parity()
    assert parity["ok"], parity
