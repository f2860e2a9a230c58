"""SWAG — Stochastic Weight Averaging-Gaussian as pure pytree functions.

Re-design of the reference's buffer-mutating torch implementation
(reference: modules/swag.py:50-250) into functional JAX:

- the posterior state is a pytree dataclass {mean, sq_mean, cov_cols,
  n_models, n_cols}; `collect_model` returns a NEW state with updated
  running moments (reference collect_model math, swag.py:163-193)
- `sample(rng, scale, cov)` draws parameters
  w = mean + sqrt(scale) * (sqrt(var) z1 + D z2 / sqrt(K-1))
  exactly like the reference's sample_fullrank (swag.py:111-161), and
  blockwise variant (swag.py:83-109)
- cov columns are stored as fixed-size [max_num_models, n] arrays with a
  ring index instead of a growing deque, so collection is jit-able and
  the state has static shapes
- because samples are ordinary params pytrees, ensemble members vmap
  across a 'member' mesh axis — the TPU ensemble-parallel path that
  replaces the reference's sequential member loop
  (swag_predictions.py:59-91, SURVEY.md §2.14)

For models built with `batch_norm: true` (true stateful BatchNorm,
models/layers.py), every sampled parameter set needs its running
statistics re-estimated with `prob.bn.bn_update` before eval-mode
prediction — exactly the reference flow (utils_swag.py:58-165);
`prob.predictions.swag_predictions` wires this in. Models using the
default stateless normalization skip it.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SWAGState", "SWAG"]

_VAR_CLAMP = 1e-30


def _flatten(tree) -> Tuple[jnp.ndarray, Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    flat = jnp.concatenate([jnp.ravel(l) for l in leaves])
    shapes = [l.shape for l in leaves]
    return flat, (treedef, shapes)


def _unflatten(flat: jnp.ndarray, meta) -> Any:
    treedef, shapes = meta
    leaves = []
    k = 0
    for s in shapes:
        n = int(np.prod(s)) if len(s) else 1
        leaves.append(flat[k: k + n].reshape(s))
        k += n
    return jax.tree_util.tree_unflatten(treedef, leaves)


@dataclasses.dataclass
class SWAGState:
    mean: jnp.ndarray          # [n] flattened
    sq_mean: jnp.ndarray       # [n]
    cov_cols: jnp.ndarray      # [max_num_models, n] deviation columns (ring)
    n_models: int
    n_cols: int                # number of valid columns
    col_head: int              # ring write position

    def tree_flatten(self):
        return ((self.mean, self.sq_mean, self.cov_cols),
                (self.n_models, self.n_cols, self.col_head))

    @classmethod
    def tree_unflatten(cls, aux, children):
        mean, sq_mean, cov_cols = children
        return cls(mean, sq_mean, cov_cols, *aux)


jax.tree_util.register_pytree_node(
    SWAGState, SWAGState.tree_flatten, SWAGState.tree_unflatten)


class SWAG:
    """SWAG posterior over a params pytree."""

    def __init__(self, params_template, no_cov_mat: bool = False,
                 max_num_models: int = 40, var_clamp: float = _VAR_CLAMP):
        flat, self._meta = _flatten(params_template)
        n = flat.shape[0]
        self.no_cov_mat = no_cov_mat
        self.max_num_models = int(max_num_models)
        self.var_clamp = var_clamp
        k = 1 if no_cov_mat else self.max_num_models
        self.state = SWAGState(
            mean=jnp.zeros(n, dtype=jnp.float32),
            sq_mean=jnp.zeros(n, dtype=jnp.float32),
            cov_cols=jnp.zeros((k, n), dtype=jnp.float32),
            n_models=0, n_cols=0, col_head=0)

    # ------------------------------------------------------------------
    def collect_model(self, params):
        """Update running moments with a new parameter snapshot."""
        w, _ = _flatten(params)
        s = self.state
        n = s.n_models
        mean = s.mean * (n / (n + 1.0)) + w / (n + 1.0)
        sq_mean = s.sq_mean * (n / (n + 1.0)) + (w ** 2) / (n + 1.0)
        cov_cols, n_cols, head = s.cov_cols, s.n_cols, s.col_head
        if not self.no_cov_mat:
            dev = w - mean
            cov_cols = cov_cols.at[head].set(dev)
            head = (head + 1) % self.max_num_models
            n_cols = min(n_cols + 1, self.max_num_models)
        self.state = SWAGState(mean=mean, sq_mean=sq_mean, cov_cols=cov_cols,
                               n_models=n + 1, n_cols=n_cols, col_head=head)
        return self.state

    # ------------------------------------------------------------------
    def sample(self, rng, scale: float = 1.0, cov: bool = True,
               block: bool = False):
        """Draw a parameter sample; returns a params pytree."""
        if cov and self.no_cov_mat:
            raise RuntimeError("covariance columns were not collected "
                               "(no_cov_mat=True)")
        s = self.state
        k1, k2 = jax.random.split(rng)
        var = jnp.clip(s.sq_mean - s.mean ** 2, self.var_clamp)
        z1 = jax.random.normal(k1, s.mean.shape)
        if block:
            # reference sample_blockwise (swag.py:83-109): scale multiplies
            # the terms directly (no sqrt)
            w = s.mean + scale * jnp.sqrt(var) * z1
            if cov:
                z2 = jax.random.normal(k2, (self.max_num_models,))
                mask = (jnp.arange(self.max_num_models) < s.n_cols)
                cov_term = (s.cov_cols * mask[:, None] * z2[:, None]).sum(0)
                w = w + (scale / np.sqrt(self.max_num_models - 1)) * cov_term
            return _unflatten(w, self._meta)
        # reference sample_fullrank (swag.py:111-161)
        rand = jnp.sqrt(var) * z1
        if cov:
            z2 = jax.random.normal(k2, (self.max_num_models,))
            mask = (jnp.arange(self.max_num_models) < s.n_cols)
            cov_term = (s.cov_cols * mask[:, None] * z2[:, None]).sum(0)
            rand = rand + cov_term / np.sqrt(self.max_num_models - 1)
        w = s.mean + np.sqrt(scale) * rand
        return _unflatten(w, self._meta)

    def sample_members(self, rng, n_members: int, scale: float = 1.0,
                       cov: bool = True):
        """Stacked ensemble member params for vmapped evaluation
        (member axis leading on every leaf)."""
        keys = jax.random.split(rng, n_members)
        samples = [self.sample(k, scale=scale, cov=cov) for k in keys]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *samples)

    # ------------------------------------------------------------------
    @property
    def mean_params(self):
        return _unflatten(self.state.mean, self._meta)

    def variance(self) -> jnp.ndarray:
        s = self.state
        return jnp.clip(s.sq_mean - s.mean ** 2, self.var_clamp)

    def export_numpy_params(self, export_cov_mat: bool = False):
        """(mean, var[, cov columns]) as numpy (reference swag.py:207-236)."""
        s = self.state
        mean = np.asarray(s.mean)
        var = np.asarray(self.variance())
        if export_cov_mat:
            return mean, var, np.asarray(s.cov_cols[: s.n_cols])
        return mean, var

    # ------------------------------------------------------------------
    def state_arrays(self) -> Dict[str, np.ndarray]:
        s = self.state
        return {"mean": np.asarray(s.mean), "sq_mean": np.asarray(s.sq_mean),
                "cov_cols": np.asarray(s.cov_cols),
                "scalars": np.asarray([s.n_models, s.n_cols, s.col_head])}

    def load_state_arrays(self, arrays: Dict[str, np.ndarray]):
        n_models, n_cols, head = (int(x) for x in arrays["scalars"])
        cov = np.asarray(arrays["cov_cols"])
        # reconcile the checkpoint's covariance-buffer geometry with this
        # instance: sampling indexes rows [0, max_num_models), so a
        # mismatched buffer would crash (or silently drop deviation
        # columns) at sample() time rather than here
        rows = 1 if self.no_cov_mat else self.max_num_models
        if cov.shape[0] != rows:
            if n_cols > min(cov.shape[0], rows):
                raise ValueError(
                    f"SWAG checkpoint has {n_cols} covariance columns in a "
                    f"{cov.shape[0]}-row buffer but this instance holds "
                    f"{rows} (max_num_models={self.max_num_models}, "
                    f"no_cov_mat={self.no_cov_mat}); rebuild the SWAG "
                    f"wrapper with the checkpoint's settings")
            resized = np.zeros((rows, cov.shape[1]), dtype=cov.dtype)
            keep = min(rows, cov.shape[0])
            resized[:keep] = cov[:keep]
            cov, head = resized, n_cols % rows
        self.state = SWAGState(
            mean=jnp.asarray(arrays["mean"]),
            sq_mean=jnp.asarray(arrays["sq_mean"]),
            cov_cols=jnp.asarray(cov),
            n_models=n_models, n_cols=n_cols, col_head=head)

    def save(self, path):
        np.savez_compressed(path, **self.state_arrays())

    def load(self, path):
        with np.load(path) as z:
            self.load_state_arrays({k: z[k] for k in z.files})
