"""Numerical parity vs the PyTorch reference-stack twin (fast CI subset).

Full suite + committed report: scripts/run_parity.py -> docs/PARITY_NUMERIC.md.
The twin (scripts/parity_torch.py) re-expresses the reference's exact model
semantics and loads IDENTICAL weights from the JAX params pytree, so any
disagreement is arithmetic, not architecture.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def pair():
    from run_parity import build_pair

    # HEALPix-4 (192 nodes) keeps the torch side fast in CI
    return build_pair(subdiv := 4, knn=8, batch=4, ar_iters=2)


class TestReferenceParity:
    def test_forward_blocks_agree(self, pair):
        from run_parity import forward_block_diffs

        diffs = forward_block_diffs(pair)
        for name, d in diffs.items():
            assert d < 5e-5, f"{name}: rel diff {d:.2e}"

    def test_gradients_agree(self, pair):
        from run_parity import gradient_diffs

        diffs = gradient_diffs(pair, n_scan=3)
        for name, d in diffs.items():
            assert d < 5e-4, f"{name}: rel diff {d:.2e}"

    def test_training_trajectory_agrees(self, pair):
        from run_parity import training_trajectories

        jl, tl, _ = training_trajectories(pair, steps=4)
        rd = np.abs(jl - tl) / np.maximum(np.abs(tl), 1e-12)
        assert rd.max() < 1e-3, f"loss trajectories diverge: {rd}"


class TestBatchNormParity:
    """Whole-loop BatchNorm golden test vs torch (VERDICT r2 #4):
    train-mode loss with batch statistics, momentum-0.1 running updates
    inside the jitted step, eval-mode validation with running stats."""

    def test_bn_training_loop_agrees(self):
        from run_parity import bn_parity, build_pair

        pair = build_pair(4, knn=8, batch=4, ar_iters=2, batch_norm=True)
        diffs = bn_parity(pair, n_batches=3, n_scan=2)
        for name, d in diffs.items():
            assert d < 5e-4, f"{name}: rel diff {d:.2e}"
