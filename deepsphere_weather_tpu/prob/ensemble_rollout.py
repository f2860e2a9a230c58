"""Member-parallel ensemble rollout — the TPU ensemble-parallelism path.

The reference evaluates SWAG/DeepEnsemble members SEQUENTIALLY
(reference: modules/swag_predictions.py:59-91, SURVEY.md §2.14). On TPU,
member params stack into a leading pytree axis and the whole block
rollout vmaps over it — one jitted executable rolls every member at once,
and on a multi-chip ('data','member') mesh the member axis shards across
chips (batch-of-members data parallelism with zero communication).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np

from ..data.ar import ARIndexer
from ..engine.step import keep_first_feedback, make_rollout_block

__all__ = ["make_ensemble_rollout", "ensemble_rollout_predictions"]


def make_ensemble_rollout(model, indexer: ARIndexer, block_size: int,
                          mesh=None):
    """Build a vmapped (member-stacked) block rollout function.

    Operator note: the Pallas BCSR operator batches under vmap via its
    custom_vmap rule — the member axis folds into the matvec columns of
    ONE shared operator (exact: the matvec is linear per column, and wide
    column counts are the kernel's best regime). Member-stacked operator
    ARRAYS (per-member Laplacians) are rejected loudly; all members share
    the geometry here, so that never triggers.


    Returns (fn, history_size) with
    fn(member_params, hist, wmask, bc_block, static, geom) ->
       (new_hist, new_wmask, preds [M, B, block, n_out, V, F])
    where member_params and hist have a leading member axis. `wmask` is
    the keep-first written-mask ([M, H] bool when
    engine.step.keep_first_feedback(indexer), else None) — thread the
    returned mask into the next block like the history. With `mesh`, the
    member axis is sharded over the mesh's 'member' dimension.
    """
    # compose on the RAW rollout: vmap over a jitted function drops its
    # donation and warns; donate the [M, B, H, V, F] member-history carry
    # on the outer jit instead
    rollout_fn, H = make_rollout_block(model, indexer, block_size, jit=False)

    vmapped = jax.vmap(rollout_fn, in_axes=(0, 0, 0, None, None, None))
    fn = jax.jit(vmapped, donate_argnums=(1,))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        member_sh = NamedSharding(mesh, P("member"))
        rep = NamedSharding(mesh, P())

        def sharded(member_params, hist, wmask, bc_block, static, geom):
            member_params = jax.device_put(member_params, member_sh)
            hist = jax.device_put(hist, member_sh)
            return fn(member_params, hist,
                      jax.device_put(wmask, member_sh)
                      if wmask is not None else None,
                      jax.device_put(bc_block, rep)
                      if bc_block is not None else None,
                      jax.device_put(static, rep)
                      if static is not None else None,
                      jax.device_put(geom, rep))

        return sharded, H
    return fn, H


def ensemble_rollout_predictions(model, member_params, *,
                                 data_dynamic, indexer: ARIndexer,
                                 n_steps: int,
                                 data_bc=None, bc_generator=None,
                                 data_static=None, scaler=None,
                                 scaler_bc=None, inverse_scale: bool = True,
                                 t0s: np.ndarray, batch_size: int = 8,
                                 mesh=None) -> np.ndarray:
    """All-member rollout -> predictions [M, n_frt, n_steps, n_out, V, F]
    (host memory; caller streams to stores). Used for moderate horizons
    where the whole rollout fits one block.

    BC handling matches engine.AutoregressivePredictions (shared
    make_bc_reader): `scaler_bc` transforms BC exactly as the training
    loader did, `bc_generator` covers rollouts beyond the BC store.
    Outputs are inverse-transformed to PHYSICAL units when `scaler` is
    given (disable with inverse_scale=False for scaled-space pipelines).
    """
    from ..engine.prediction import make_bc_reader

    n_members = jax.tree_util.tree_leaves(member_params)[0].shape[0]
    fn, H = make_ensemble_rollout(model, indexer, n_steps, mesh=mesh)
    geom = jax.device_put(model.geometry_pytree())
    static = (jax.device_put(data_static.read_stacked())
              if data_static is not None else None)
    V = data_dynamic.n_node
    F = data_dynamic.n_feature
    dt = data_dynamic.timestep
    min_k = min(indexer.input_k)
    read_bc = make_bc_reader(data_dynamic, data_bc, bc_generator, scaler_bc)
    in_offs = np.asarray(indexer.input_k)
    out_offs = np.asarray(indexer.output_k)
    outs = []
    for lo in range(0, len(t0s), batch_size):
        sel = t0s[lo: lo + batch_size]
        B = len(sel)
        hist = np.zeros((B, H, V, F), dtype=np.float32)
        for b, t0 in enumerate(sel):
            t_hist = np.arange(t0 + min_k, t0 + min(indexer.output_k))
            vals = data_dynamic.read_stacked(t_hist)
            if scaler is not None:
                vals = scaler.transform(
                    vals, time=data_dynamic.time[t_hist]).astype(np.float32)
            hist[b, : len(t_hist)] = vals
        hist_m = jnp.broadcast_to(jnp.asarray(hist)[None],
                                  (n_members,) + hist.shape)
        wmask_m = (jnp.zeros((n_members, H), dtype=bool)
                   if keep_first_feedback(indexer) else None)
        bc_block = None
        if data_bc is not None or bc_generator is not None:
            bc_rows = [read_bc(t0, i * indexer.forecast_cycle + in_offs)
                       for t0 in sel for i in range(n_steps)]
            bc_block = jnp.asarray(
                np.asarray(bc_rows, dtype=np.float32).reshape(
                    B, n_steps, len(in_offs), V, bc_rows[0].shape[-1]))
        _, _, preds = fn(member_params, hist_m, wmask_m, bc_block, static,
                         geom)
        preds = np.asarray(preds)          # [M, B, n_steps, n_out, V, F]
        if scaler is not None and inverse_scale:
            for i in range(n_steps):
                for oi in range(len(out_offs)):
                    t_valid = (data_dynamic.time[sel]
                               + (i * indexer.forecast_cycle
                                  + out_offs[oi]) * dt)
                    preds[:, :, i, oi] = scaler.inverse_transform(
                        preds[:, :, i, oi], time=t_valid)
        outs.append(preds)
    return np.concatenate(outs, axis=1)
