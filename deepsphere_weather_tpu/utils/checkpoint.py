"""Checkpointing: params + optimizer + scheduler + PRNG state.

TPU equivalent of the reference's torch.save state-dict checkpoints and
pickled AR-scheduler training info (reference: utils_config.py:409-425,
SURVEY.md §5.4). Pytrees are stored as .npz with '/'-joined key paths
(framework-version tagged); host-side states (scheduler, early stopping,
training info) as JSON. No pickle: checkpoints are portable and
inspectable.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = ["save_pytree", "load_pytree", "Checkpointer"]

_SEP = "/"


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return _SEP.join(parts)


def save_pytree(path, tree: Any, extra_meta: Optional[Dict] = None):
    """Save an array pytree to .npz keyed by tree paths."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    arrays = {_path_str(p): np.asarray(v) for p, v in flat}
    meta = {"format": "dsw_tpu_pytree_v1"}
    if extra_meta:
        meta.update(extra_meta)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **arrays)


def load_pytree(path, template: Any) -> Any:
    """Load arrays into the structure of `template`."""
    with np.load(path) as z:
        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for p, v in flat:
            key = _path_str(p)
            if key not in z:
                raise KeyError(f"checkpoint missing key {key!r}")
            arr = z[key]
            leaves.append(arr)
        return jax.tree_util.tree_unflatten(treedef, leaves)


class Checkpointer:
    """Experiment checkpoint directory manager.

    Layout (mirrors the reference experiment contract,
    utils_config.py:539-581):
      <exp_dir>/model_weights/model.npz          final/best weights
      <exp_dir>/model_weights/model_epoch_N.npz  per-epoch (optional)
      <exp_dir>/training_info/state.json         scheduler + early stopping
      <exp_dir>/training_info/opt_state.npz      optimizer state
    """

    def __init__(self, exp_dir):
        self.exp_dir = Path(exp_dir)
        (self.exp_dir / "model_weights").mkdir(parents=True, exist_ok=True)
        (self.exp_dir / "training_info").mkdir(parents=True, exist_ok=True)

    def save_model(self, params, name: str = "model.npz"):
        save_pytree(self.exp_dir / "model_weights" / name, params)

    def load_model(self, template, name: str = "model.npz"):
        return load_pytree(self.exp_dir / "model_weights" / name, template)

    def save_training_state(self, opt_state, scheduler_state: Dict,
                            early_stopping_state: Dict, extra: Optional[Dict] = None):
        save_pytree(self.exp_dir / "training_info" / "opt_state.npz", opt_state)
        state = {"ar_scheduler": scheduler_state,
                 "early_stopping": early_stopping_state}
        if extra:
            state.update(extra)
        (self.exp_dir / "training_info" / "state.json").write_text(
            json.dumps(state, indent=1, default=float))

    def load_training_state(self, opt_state_template):
        opt_state = load_pytree(
            self.exp_dir / "training_info" / "opt_state.npz", opt_state_template)
        state = json.loads(
            (self.exp_dir / "training_info" / "state.json").read_text())
        return opt_state, state

    def save_norm_state(self, norm_state, name: str = "norm_state.npz"):
        """BatchNorm running statistics (empty dict = nothing saved)."""
        if norm_state:
            save_pytree(self.exp_dir / "model_weights" / name, norm_state)

    def load_norm_state(self, template, name: str = "norm_state.npz"):
        """Running stats saved by save_norm_state; None when absent."""
        path = self.exp_dir / "model_weights" / name
        if not path.exists():
            return None
        return load_pytree(path, template)

    def has_checkpoint(self, name: str = "model.npz") -> bool:
        return (self.exp_dir / "model_weights" / name).exists()

    def load_scheduler_state(self):
        """The saved AR-scheduler state dict, or None if absent — the one
        place that knows the training_info/state.json layout."""
        path = self.exp_dir / "training_info" / "state.json"
        if not path.exists():
            return None
        return json.loads(path.read_text()).get("ar_scheduler")
