"""Jitted AR step builders: multi-step loss, train step, rollout blocks.

The reference's hot loop (reference: SURVEY.md §3.1 — python-level AR
iteration with per-step CUDA launches, get_aligned_ar_batch H2D copies and
loss accumulation) becomes a single jitted `lax.scan` over AR iterations:

- the scaled truth window `dynamic` [B, W, V, F] doubles as the rollout
  buffer: each iteration's prediction is scattered into a copy at its
  output positions, so later iterations consume model predictions exactly
  like `stack_most_recent_prediction=True` (SURVEY.md §2.9)
- per-iteration losses are area-weighted MSE, combined with the (dynamic,
  device-resident) AR-scheduler weight vector — growing weights never
  recompiles; growing the *number* of scanned iterations compiles once per
  AR stage (bounded by ar_iterations, each cached)
- 'AR' training strategy stops gradients at the buffer write (each step
  learns independently); 'RNN' backpropagates through the whole rollout

Prediction uses a rolling-history carry so unbounded rollouts (reference:
7300-step 5-year simulations, 05_exp_X_year_sims.py:36-46) run in blocks
of jit-compiled scans with O(history) memory (`ar_blocks` semantics,
predict_state.py:202-224).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.ar import ARIndexer
from .loss import weighted_mse

__all__ = ["assemble_input", "make_ar_loss_fn", "fold_running_stats",
           "make_train_step",
           "make_member_train_step", "make_validation_fn",
           "make_cached_train_step", "make_cached_validation_fn",
           "make_cached_member_train_step", "make_member_validation_fn",
           "make_cached_member_validation_fn", "make_rollout_block",
           "keep_first_feedback"]


def keep_first_feedback(indexer: "ARIndexer") -> bool:
    """True when the AR feedback must keep the FIRST prediction per slot
    (xforecasting stack_most_recent_prediction=False with overlapping
    output windows) — rollouts then need a written-mask threaded across
    blocks."""
    return (not indexer.stack_most_recent_prediction
            and indexer.has_overlapping_outputs)


def assemble_input(dyn_buf: jnp.ndarray, bc: Optional[jnp.ndarray],
                   static: Optional[jnp.ndarray],
                   pin: jnp.ndarray) -> jnp.ndarray:
    """Build the model input for one AR iteration.

    dyn_buf: [B, W, V, Fd]; bc: [B, W, V, Fb] or None; static: [V, Fs] or
    None; pin: [n_in] window positions. Feature order static+bc+dynamic
    (reference: my_models_graph.py:319-325).
    """
    x_dyn = jnp.take(dyn_buf, pin, axis=1)              # [B, n_in, V, Fd]
    B, T, V, _ = x_dyn.shape
    parts = []
    if static is not None:
        parts.append(jnp.broadcast_to(static[None, None], (B, T) + static.shape))
    if bc is not None:
        parts.append(jnp.take(bc, pin, axis=1))
    parts.append(x_dyn)
    return jnp.concatenate(parts, axis=-1)


def make_context(model, area_w: jnp.ndarray) -> Dict:
    """Device-resident step context: model geometry + loss weights.

    Passed as a jit ARGUMENT to every step. Closure-captured device
    constants are re-uploaded on every executable invocation on tunneled
    TPU runtimes (~50 MB/step at HEALPix-16 — measured 730 ms vs 35 ms),
    so all large static arrays must flow through arguments.
    """
    # area_w None = unweighted loss (AutoregressiveTraining's documented
    # default; weighted_mse substitutes unit weights)
    return jax.device_put({"geom": model.geometry_pytree(),
                           "area_w": (jnp.asarray(area_w)
                                      if area_w is not None else None)})


def make_ar_loss_fn(model, indexer: ARIndexer,
                    n_scan_iterations: int,
                    ar_training_strategy: str = "RNN",
                    remat: bool = False,
                    collect_stats: bool = False,
                    eval_mode: bool = False) -> Callable:
    """Build loss(params, batch, ar_weights, ctx) -> (total, aux).

    aux is per_iter losses, or (per_iter, stats) with `collect_stats` —
    stats is the model's per-AR-iteration batch-normalization statistics
    pytree (leaves stacked over the scan axis), consumed by the train
    step's running update (torch BN training semantics, reference:
    my_models_graph.py:97-99 + torch.nn.BatchNorm1d momentum 0.1).

    `eval_mode=True` scores with running statistics from ctx["norm_state"]
    (model.apply(train=False)) — the reference validates BatchNorm models
    in model.eval() mode, so early stopping / AR growth must see the
    eval-mode loss, not train-mode batch statistics.

    `n_scan_iterations` is static (= current AR iterations + 1); the AR
    weight vector is a traced [n_scan_iterations] array; ctx comes from
    make_context.

    `remat=True` wraps each AR iteration in `jax.checkpoint`: the backward
    pass recomputes that iteration's UNet internals instead of keeping
    them live, cutting peak activation HBM by ~the AR depth at the cost of
    one extra forward per iteration. Use it when the footprint exceeds the
    chip — e.g. member-parallel ensembles at HEALPix-64+, or large batches
    at HEALPix-128 (SURVEY.md §7 'jax.checkpoint / rematerialisation').
    """
    if ar_training_strategy not in ("RNN", "AR"):
        raise ValueError("ar_training_strategy must be 'RNN' or 'AR'")
    if collect_stats and eval_mode:
        raise ValueError("collect_stats is a training-mode channel")
    in_pos = jnp.asarray(indexer.input_pos)
    out_pos = jnp.asarray(indexer.output_pos)
    stop_grad = ar_training_strategy == "AR"
    # keep-first feedback (stack_most_recent_prediction=False) only
    # changes anything when output windows overlap across iterations —
    # skip the written-mask machinery otherwise
    keep_first = keep_first_feedback(indexer)

    def loss_fn(params, batch: Dict, ar_weights: jnp.ndarray, ctx: Dict):
        dyn = batch["dynamic"]
        bc = batch.get("bc")
        static = batch.get("static")
        geom = ctx["geom"]
        area_w = ctx["area_w"]
        W = dyn.shape[1]

        def step(carry, i):
            dyn_buf, written = carry
            x = assemble_input(dyn_buf, bc, static, in_pos[i])
            if eval_mode:
                y_pred = model.apply(params, x, geom=geom,
                                     norm_state=ctx.get("norm_state"),
                                     train=False)
                stats = None
            elif collect_stats:
                stats = {}
                y_pred = model.apply(params, x, geom=geom, stats_out=stats)
            else:
                y_pred = model.apply(params, x, geom=geom)
                stats = None
            y_true = jnp.take(dyn, out_pos[i], axis=1)
            l = weighted_mse(y_pred, y_true, area_w)
            y_write = jax.lax.stop_gradient(y_pred) if stop_grad else y_pred
            if keep_first:
                # a slot predicted by an EARLIER iteration keeps that
                # prediction (xforecasting stack_most_recent=False)
                prev = jnp.take(dyn_buf, out_pos[i], axis=1)
                wmask = jnp.take(written, out_pos[i])        # [n_out]
                y_write = jnp.where(wmask[None, :, None, None], prev,
                                    y_write)
                written = written.at[out_pos[i]].set(True)
            dyn_buf = dyn_buf.at[:, out_pos[i]].set(y_write)
            ys = (l, stats) if collect_stats else l
            return (dyn_buf, written), ys

        # fully unrolled: AR depth is small (<= ~20) and unrolling lets XLA
        # overlap/fuse across iterations (measured ~7% step-time win).
        # EXCEPT under remat: unroll x jax.checkpoint multiplies the XLA
        # graph by the AR depth (each unrolled iteration carries its own
        # rematerialized backward) — the HEALPix-64 AR6 remat BPTT step
        # measured a ~45+ min compile unrolled vs minutes rolled, for a
        # one-time ~7% execution win that remat's recompute swamps anyway
        step_fn = jax.checkpoint(step) if remat else step
        carry0 = (dyn, jnp.zeros((W,), dtype=bool))
        _, ys = jax.lax.scan(step_fn, carry0,
                             jnp.arange(n_scan_iterations),
                             unroll=not remat)
        losses, stats = ys if collect_stats else (ys, None)
        w = ar_weights[:n_scan_iterations]
        w = w / jnp.maximum(w.sum(), 1e-12)
        total = jnp.sum(losses * w)
        if collect_stats:
            # statistics feed the running update only — no gradient
            return total, (losses, jax.lax.stop_gradient(stats))
        return total, losses

    return loss_fn


def fold_running_stats(norm_state: Dict, scan_stats: Dict,
                       momentum: float = 0.1) -> Dict:
    """Fold a scan's per-iteration batch statistics into the running state.

    `scan_stats` mirrors norm_state's nesting with leaves stacked over the
    scan axis [n_scan, C]; each AR iteration's model call applies one
    momentum-0.1 update in order, exactly like torch BN updating during
    every training-mode forward (reference my_models_graph.py:97-99).
    """
    def fold(state_leaf, stats_leaf):
        out = state_leaf
        for i in range(stats_leaf.shape[0]):
            out = (1.0 - momentum) * out + momentum * stats_leaf[i]
        return out

    return jax.tree_util.tree_map(fold, norm_state, scan_stats)


def make_train_step(model, indexer: ARIndexer,
                    optimizer: optax.GradientTransformation,
                    n_scan_iterations: int,
                    ar_training_strategy: str = "RNN",
                    remat: bool = False,
                    with_norm_state: bool = False) -> Callable:
    """Jitted train step: (params, opt_state, batch, ar_weights, ctx) ->
    (params, opt_state, total_loss, per_iter_losses).

    `with_norm_state=True` (BatchNorm models): signature becomes
    (params, opt_state, norm_state, batch, ar_weights, ctx) ->
    (params, opt_state, norm_state, total, per_iter) — each AR iteration's
    batch statistics fold into the running state with momentum 0.1 inside
    the jitted step (torch BN training semantics,
    reference my_models_graph.py:97-99), so BatchNorm training needs no
    per-step host sync and no post-hoc bn_update pass."""
    loss_fn = make_ar_loss_fn(model, indexer, n_scan_iterations,
                              ar_training_strategy, remat=remat,
                              collect_stats=with_norm_state)

    # params/opt_state are rebound by the caller every step — donate both
    # (in-place Adam updates, no spurious HBM copies). The batch is NOT
    # donated: callers may legitimately reuse a device-resident batch
    # (benchmarks, bn_update passes).
    if with_norm_state:
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_step(params, opt_state, norm_state, batch, ar_weights,
                       ctx):
            (total, (per_iter, stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch, ar_weights, ctx)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            norm_state = fold_running_stats(norm_state, stats)
            return params, opt_state, norm_state, total, per_iter

        return train_step

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, ar_weights, ctx):
        (total, per_iter), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, ar_weights, ctx)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total, per_iter

    return train_step


def make_member_train_step(model, indexer: ARIndexer,
                           optimizer: optax.GradientTransformation,
                           n_scan_iterations: int,
                           ar_training_strategy: str = "RNN",
                           remat: bool = False,
                           with_norm_state: bool = False) -> Callable:
    """MEMBER-PARALLEL train step: every DeepEnsemble member advances in
    one jitted executable.

    The reference trains ensemble members as sequential subprocesses
    (reference: scripts_training/06_exp_DeepEnsemble.py:62-102); here the
    member axis is a vmapped leading pytree axis — on a mesh it shards
    over 'member' (independent gradients, zero cross-member
    communication). Signature matches make_train_step with
    member-stacked params/opt_state and a shared batch:
    (member_params, member_opt_state, batch, ar_weights, ctx).

    Operator note: the Pallas BCSR operator batches under vmap via its
    custom_vmap rule (member axis folded into the matvec columns of the
    shared operator), so member-parallel training works with
    `use_pallas=True` at 12k+ nodes too; only member-stacked operator
    arrays (per-member Laplacians) are unsupported, and the geometry ctx
    is shared across members here.

    `with_norm_state=True`: norm_state is member-STACKED like params (each
    member's BN running statistics evolve with its own weights); signature
    gains it as the third donated argument/output.
    """
    loss_fn = make_ar_loss_fn(model, indexer, n_scan_iterations,
                              ar_training_strategy, remat=remat,
                              collect_stats=with_norm_state)

    if with_norm_state:
        def one_member_ns(params, opt_state, norm_state, batch, ar_weights,
                          ctx):
            (total, (per_iter, stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch, ar_weights, ctx)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            norm_state = fold_running_stats(norm_state, stats)
            return params, opt_state, norm_state, total, per_iter

        vstep = jax.vmap(one_member_ns, in_axes=(0, 0, 0, None, None, None))
        return functools.partial(jax.jit, donate_argnums=(0, 1, 2))(vstep)

    def one_member(params, opt_state, batch, ar_weights, ctx):
        (total, per_iter), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, ar_weights, ctx)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total, per_iter

    vstep = jax.vmap(one_member, in_axes=(0, 0, None, None, None))
    return functools.partial(jax.jit, donate_argnums=(0, 1))(vstep)


def make_validation_fn(model, indexer: ARIndexer,
                       n_scan_iterations: int,
                       eval_mode: bool = False) -> Callable:
    """`eval_mode=True` (BatchNorm models) scores with the running
    statistics the caller merges into ctx as ctx["norm_state"]
    (reference: validation runs under model.eval())."""
    loss_fn = make_ar_loss_fn(model, indexer, n_scan_iterations, "RNN",
                              eval_mode=eval_mode)

    @jax.jit
    def validate(params, batch, ar_weights, ctx):
        return loss_fn(params, batch, ar_weights, ctx)

    return validate


def make_member_validation_fn(model, indexer: ARIndexer,
                              n_scan_iterations: int,
                              eval_mode: bool = False) -> Callable:
    """Validation over member-stacked params: returns ([M], [M, n_scan]).

    `eval_mode=True`: ctx carries a member-STACKED ctx["norm_state"],
    vmapped alongside params."""
    loss_fn = make_ar_loss_fn(model, indexer, n_scan_iterations, "RNN",
                              eval_mode=eval_mode)

    if eval_mode:
        @jax.jit
        def validate(member_params, batch, ar_weights, ctx):
            ctx = dict(ctx)
            norm_state = ctx.pop("norm_state")

            def one(params, ns):
                return loss_fn(params, batch, ar_weights,
                               {**ctx, "norm_state": ns})

            return jax.vmap(one)(member_params, norm_state)

        return validate

    @jax.jit
    def validate(member_params, batch, ar_weights, ctx):
        return jax.vmap(loss_fn, in_axes=(0, None, None, None))(
            member_params, batch, ar_weights, ctx)

    return validate


# ---------------------------------------------------------------------------
# Device-resident-data steps (HBM dataset cache)
# ---------------------------------------------------------------------------

def _gather_window_batch(data: Dict, widx: jnp.ndarray) -> Dict:
    """Materialize one window batch from the device-resident dataset.

    data: {'dynamic': [T, V, Fd], 'bc': [T, V, Fb]|None,
    'static': [V, Fs]|None} — the whole (pre-scaled) training timeline in
    HBM; widx: [B, W] int32 absolute time indices. The gather yields the
    exact arrays the host loader would have assembled
    (AutoregressiveDataset.get_batch), but the per-step H2D transfer is
    just widx (~1 KB) instead of the [B, W, V, F] window (~9 MB at
    HEALPix-16 — the pace-setter on hosts with slow interconnect)."""
    batch = {"dynamic": jnp.take(data["dynamic"], widx, axis=0)}
    if data.get("bc") is not None:
        batch["bc"] = jnp.take(data["bc"], widx, axis=0)
    if data.get("static") is not None:
        batch["static"] = data["static"]
    return batch


def make_cached_train_step(model, indexer: ARIndexer,
                           optimizer: optax.GradientTransformation,
                           n_scan_iterations: int,
                           ar_training_strategy: str = "RNN",
                           remat: bool = False,
                           with_norm_state: bool = False) -> Callable:
    """Train step over a device-resident dataset: (params, opt_state,
    data, widx, ar_weights, ctx) -> (params, opt_state, total, per_iter).

    Identical math to make_train_step on the host-assembled batch (the
    window gather moves inside jit); `data` is NOT donated — it is reused
    by every step of the run. `with_norm_state` matches make_train_step
    (norm_state threaded as the third argument/output)."""
    loss_fn = make_ar_loss_fn(model, indexer, n_scan_iterations,
                              ar_training_strategy, remat=remat,
                              collect_stats=with_norm_state)

    if with_norm_state:
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_step(params, opt_state, norm_state, data, widx,
                       ar_weights, ctx):
            batch = _gather_window_batch(data, widx)
            (total, (per_iter, stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch, ar_weights, ctx)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            norm_state = fold_running_stats(norm_state, stats)
            return params, opt_state, norm_state, total, per_iter

        return train_step

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, data, widx, ar_weights, ctx):
        batch = _gather_window_batch(data, widx)
        (total, per_iter), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, ar_weights, ctx)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total, per_iter

    return train_step


def make_cached_validation_fn(model, indexer: ARIndexer,
                              n_scan_iterations: int,
                              eval_mode: bool = False) -> Callable:
    loss_fn = make_ar_loss_fn(model, indexer, n_scan_iterations, "RNN",
                              eval_mode=eval_mode)

    @jax.jit
    def validate(params, data, widx, ar_weights, ctx):
        batch = _gather_window_batch(data, widx)
        return loss_fn(params, batch, ar_weights, ctx)

    return validate


def make_cached_member_train_step(model, indexer: ARIndexer,
                                  optimizer: optax.GradientTransformation,
                                  n_scan_iterations: int,
                                  ar_training_strategy: str = "RNN",
                                  remat: bool = False,
                                  with_norm_state: bool = False) -> Callable:
    """Member-parallel train step over a device-resident dataset: the
    window batch is gathered ONCE and shared by every vmapped member
    (make_member_train_step semantics + make_cached_train_step H2D
    profile). Signature: (member_params, member_opt_state, data, widx,
    ar_weights, ctx); with_norm_state inserts the member-stacked
    norm_state as the third donated argument/output."""
    loss_fn = make_ar_loss_fn(model, indexer, n_scan_iterations,
                              ar_training_strategy, remat=remat,
                              collect_stats=with_norm_state)

    if with_norm_state:
        def one_member_ns(params, opt_state, norm_state, batch, ar_weights,
                          ctx):
            (total, (per_iter, stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch, ar_weights, ctx)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            norm_state = fold_running_stats(norm_state, stats)
            return params, opt_state, norm_state, total, per_iter

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_step_ns(member_params, member_opt_state, member_norm_state,
                          data, widx, ar_weights, ctx):
            batch = _gather_window_batch(data, widx)
            return jax.vmap(one_member_ns,
                            in_axes=(0, 0, 0, None, None, None))(
                member_params, member_opt_state, member_norm_state, batch,
                ar_weights, ctx)

        return train_step_ns

    def one_member(params, opt_state, batch, ar_weights, ctx):
        (total, per_iter), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, ar_weights, ctx)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total, per_iter

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(member_params, member_opt_state, data, widx, ar_weights,
                   ctx):
        batch = _gather_window_batch(data, widx)
        return jax.vmap(one_member, in_axes=(0, 0, None, None, None))(
            member_params, member_opt_state, batch, ar_weights, ctx)

    return train_step


def make_cached_member_validation_fn(model, indexer: ARIndexer,
                                     n_scan_iterations: int,
                                     eval_mode: bool = False) -> Callable:
    loss_fn = make_ar_loss_fn(model, indexer, n_scan_iterations, "RNN",
                              eval_mode=eval_mode)

    if eval_mode:
        @jax.jit
        def validate(member_params, data, widx, ar_weights, ctx):
            batch = _gather_window_batch(data, widx)
            ctx = dict(ctx)
            norm_state = ctx.pop("norm_state")

            def one(params, ns):
                return loss_fn(params, batch, ar_weights,
                               {**ctx, "norm_state": ns})

            return jax.vmap(one)(member_params, norm_state)

        return validate

    @jax.jit
    def validate(member_params, data, widx, ar_weights, ctx):
        batch = _gather_window_batch(data, widx)
        return jax.vmap(loss_fn, in_axes=(0, None, None, None))(
            member_params, batch, ar_weights, ctx)

    return validate


# ---------------------------------------------------------------------------
# Prediction rollout
# ---------------------------------------------------------------------------

def make_rollout_block(model, indexer: ARIndexer, block_size: int,
                       jit: bool = True,
                       norm_state: Optional[Dict] = None) -> Tuple[Callable, int]:
    """Build the jitted block-rollout function for unbounded AR prediction.

    The carry is a rolling history buffer of the last H timesteps of
    (predicted or observed) dynamic fields, where
    H = max(output_k) - min(input_k) + 1. Each scan step:
      1. assembles inputs from fixed positions in the buffer,
      2. predicts, 3. emits the prediction, 4. shifts the buffer left by
      forecast_cycle and writes the prediction at its output offsets.

    BC features for the whole block are supplied as [B, block, n_in, V, Fb]
    (host-gathered: BC is known for all future times). Returns
    (rollout_fn, history_size).
    rollout_fn(params, hist, wmask, bc_block, static, geom,
               noise_block=None) ->
    (new_hist, new_wmask, preds [B, block, n_out, V, F]).

    `noise_block` ([B, block, n_out, V, F], scaled space) adds stochastic
    model-error perturbations to each step's prediction BEFORE feedback
    and emission (y = f(x) + eps) — the ensemble-calibration path
    (perturbed-analysis + stochastic-physics-style ensembles; the
    reference's verify_DeepEnsemble.py leaves ensembles underdispersive
    with no perturbation machinery at all).

    `wmask` is the keep-first written-mask: pass None unless the indexer
    needs keep-first feedback (keep_first_feedback(indexer)); then start a
    rollout with jnp.zeros((H,), bool) and thread the returned mask into
    the next block — it is part of the rollout state, and resetting it at
    a block boundary would silently fall back to most-recent feedback for
    slots predicted in an earlier block.
    """
    fc = indexer.forecast_cycle
    min_k = min(indexer.input_k)
    max_out = max(indexer.output_k)
    H = max_out - min_k + 1
    # positions inside the history buffer: index 0 holds time t0 + min_k
    in_pos = jnp.asarray([k - min_k for k in indexer.input_k], dtype=jnp.int32)
    out_pos = jnp.asarray([k - min_k for k in indexer.output_k], dtype=jnp.int32)
    keep_first = keep_first_feedback(indexer)

    def rollout(params, hist, wmask, bc_block, static, geom,
                noise_block=None):
        if keep_first and wmask is None:
            raise ValueError(
                "this indexer keeps FIRST predictions "
                "(stack_most_recent_prediction=False with overlapping "
                "output_k): pass wmask=jnp.zeros((H,), bool) for the first "
                "block and thread the returned mask across blocks")
        if not keep_first:
            wmask = None                       # nothing to carry

        def step(carry, xs):
            h, wmask = carry
            bc_i = xs.get("bc")
            x_dyn = jnp.take(h, in_pos, axis=1)          # [B, n_in, V, Fd]
            B, T, V, _ = x_dyn.shape
            parts = []
            if static is not None:
                parts.append(jnp.broadcast_to(static[None, None],
                                              (B, T) + static.shape))
            if bc_i is not None:
                parts.append(bc_i)                        # [B, n_in, V, Fb]
            parts.append(x_dyn)
            x = jnp.concatenate(parts, axis=-1)
            # eval-mode normalization when the model carries BatchNorm
            # running stats (reference: model.eval() before predictions)
            if norm_state:
                y = model.apply(params, x, geom=geom,
                                norm_state=norm_state, train=False)
            else:
                y = model.apply(params, x, geom=geom)     # [B, n_out, V, Fd]
            if "noise" in xs:
                y = y + xs["noise"]
            y_write = y
            if keep_first:
                prev = jnp.take(h, out_pos, axis=1)
                wsel = jnp.take(wmask, out_pos)           # [n_out]
                y_write = jnp.where(wsel[None, :, None, None], prev, y)
                wmask = wmask.at[out_pos].set(True)
                # roll the mask with the buffer; slots entering from the
                # future are unwritten
                wmask = jnp.roll(wmask, -fc)
                wmask = wmask.at[-fc:].set(False)
            h = h.at[:, out_pos].set(y_write)
            h = jnp.roll(h, -fc, axis=1)                  # advance one cycle
            return (h, wmask), y

        carry0 = (hist, wmask)
        xs = {}
        if bc_block is not None:
            xs["bc"] = jnp.swapaxes(bc_block, 0, 1)
        if noise_block is not None:
            xs["noise"] = jnp.swapaxes(noise_block, 0, 1)
        if xs:
            (hist, wmask), preds = jax.lax.scan(step, carry0, xs)
        else:
            def step_noxs(c, _):
                return step(c, {})
            (hist, wmask), preds = jax.lax.scan(step_noxs, carry0,
                                                jnp.arange(block_size))
        # [block, B, n_out, V, F] -> [B, block, n_out, V, F]
        return hist, wmask, jnp.swapaxes(preds, 0, 1)

    # donate the history carry: multi-year rollouts re-enter block after
    # block and never reuse the previous buffer. jit=False returns the raw
    # function for callers that compose it (vmap over ensemble members)
    # before jitting — donation on an inner jit under vmap is dropped.
    if not jit:
        return rollout, H
    return jax.jit(rollout, donate_argnums=(1,)), H
