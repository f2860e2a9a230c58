"""Autoregressive training engine (xforecasting.AutoregressiveTraining parity).

Orchestrates the jitted AR train step (engine/step.py) with:
- AR scheduler weight growth per scoring interval + AR-iteration growth on
  early-stopping plateaus (reference: train_predict_state.py:343-381)
- RNN / AR training strategies (weight fixing + stop-gradient policy)
- validation scoring, EarlyStopping, per-epoch checkpoints
- SWAG moment collection hooks (swag=True, swag_freq, swa_start —
  reference: finetune_swag.py:354-401)
- optional ('data',) mesh sharding of batches (SURVEY.md §2.14)

Returns an ARTrainingInfo with the full metric history and .plots().
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import numpy as np
import optax

from ..data.ar import ARIndexer
from ..data.loader import AutoregressiveDataLoader, AutoregressiveDataset
from ..parallel.mesh import (TRAIN_BATCH_KEYS, put_device_dataset,
                             replicated_sharding, shard_batch,
                             shard_window_indices)
from ..utils.checkpoint import Checkpointer
from .scheduler import ARScheduler, EarlyStopping
from .step import (make_cached_member_train_step,
                   make_cached_member_validation_fn, make_cached_train_step,
                   make_cached_validation_fn, make_context,
                   make_member_train_step, make_member_validation_fn,
                   make_train_step, make_validation_fn)

__all__ = ["ARTrainingInfo", "AutoregressiveTraining"]


def _set_opt_lr(opt_state, lr: float):
    """Overwrite the learning_rate hyperparam of an
    optax.inject_hyperparams-wrapped optimizer state. Shape/dtype are
    preserved (full_like), so the jitted step does not recompile and
    member-stacked states broadcast across the member axis."""
    hp = getattr(opt_state, "hyperparams", None)
    if hp is None or "learning_rate" not in hp:
        raise ValueError(
            "lr scheduling (lr_decay_on_growth / lr_plateau_decay) needs an "
            "optax.inject_hyperparams-wrapped optimizer exposing "
            "'learning_rate'; cli/train_predict builds one when these "
            "training settings are active")
    new = dict(hp)
    new["learning_rate"] = jax.numpy.full_like(hp["learning_rate"], lr)
    return opt_state._replace(hyperparams=new)


@dataclasses.dataclass
class ARTrainingInfo:
    """Training metric history (xforecasting.AR_TrainingInfo parity)."""

    iterations: List[int] = dataclasses.field(default_factory=list)
    training_total_loss: List[float] = dataclasses.field(default_factory=list)
    validation_iterations: List[int] = dataclasses.field(default_factory=list)
    validation_total_loss: List[float] = dataclasses.field(default_factory=list)
    per_iteration_loss: List[List[float]] = dataclasses.field(default_factory=list)
    ar_weights_history: List[List[float]] = dataclasses.field(default_factory=list)
    ar_growth_events: List[int] = dataclasses.field(default_factory=list)
    epoch_boundaries: List[int] = dataclasses.field(default_factory=list)
    samples_per_sec: List[float] = dataclasses.field(default_factory=list)
    # member-parallel runs: per-member validation loss at each scoring
    # interval ([n_intervals][n_members]); empty for single-member runs
    per_member_loss: List[List[float]] = dataclasses.field(default_factory=list)

    def to_dict(self) -> Dict:
        return dataclasses.asdict(self)

    def save(self, path):
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text(json.dumps(self.to_dict(), default=float))

    @classmethod
    def load(cls, path) -> "ARTrainingInfo":
        return cls(**json.loads(Path(path).read_text()))

    def plots(self, exp_dir, ylim=None):
        """Render training/validation curves (reference:
        ar_training_info.plots, train_predict_state.py:449)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig_dir = Path(exp_dir) / "figs" / "training_info"
        fig_dir.mkdir(parents=True, exist_ok=True)

        fig, ax = plt.subplots(figsize=(8, 5))
        ax.plot(self.iterations, self.training_total_loss, label="training",
                lw=0.8)
        if self.validation_total_loss:
            ax.plot(self.validation_iterations, self.validation_total_loss,
                    label="validation", lw=1.2)
        for ev in self.ar_growth_events:
            ax.axvline(ev, color="gray", ls="--", lw=0.6)
        ax.set_xlabel("weight update")
        ax.set_ylabel("total loss")
        if ylim:
            ax.set_ylim(ylim)
        ax.legend()
        ax.set_title("AR training")
        fig.tight_layout()
        fig.savefig(fig_dir / "loss_curves.png", dpi=120)
        plt.close(fig)

        if self.per_iteration_loss:
            fig, ax = plt.subplots(figsize=(8, 5))
            arr = np.full((len(self.per_iteration_loss),
                           max(len(x) for x in self.per_iteration_loss)), np.nan)
            for i, row in enumerate(self.per_iteration_loss):
                arr[i, : len(row)] = row
            for j in range(arr.shape[1]):
                ax.plot(self.validation_iterations, arr[:, j],
                        label=f"AR iter {j}", lw=0.9)
            ax.set_xlabel("weight update")
            ax.set_ylabel("per-leadtime validation loss")
            ax.legend(fontsize=7)
            fig.tight_layout()
            fig.savefig(fig_dir / "per_leadtime_loss.png", dpi=120)
            plt.close(fig)
        return fig_dir


def AutoregressiveTraining(
    model,
    params,
    *,
    # data
    training_data_dynamic,
    validation_data_dynamic=None,
    training_data_bc=None,
    validation_data_bc=None,
    data_static=None,
    scaler=None,
    scaler_bc=None,
    # AR settings
    input_k,
    output_k,
    forecast_cycle,
    ar_iterations,
    stack_most_recent_prediction: bool = True,
    ar_training_strategy: str = "RNN",
    # loss / optimizer
    area_weights=None,
    learning_rate: float = 0.007,
    optimizer: Optional[optax.GradientTransformation] = None,
    ar_scheduler: Optional[ARScheduler] = None,
    early_stopping: Optional[EarlyStopping] = None,
    # Per-AR-stage convergence levers (config/settings.py docs; defaults
    # keep reference semantics). "full" resets best+counter+clock at each
    # growth; lr_decay_on_growth multiplies the lr per growth event;
    # lr_plateau_decay turns the final-stage stop into ReduceLROnPlateau
    # (decay + full reset, at most lr_plateau_max_decays times). The lr
    # levers require an optax.inject_hyperparams-wrapped optimizer.
    early_stopping_reset_on_growth: str = "counter",
    lr_decay_on_growth: float = 1.0,
    lr_plateau_decay: float = 0.0,
    lr_plateau_max_decays: int = 2,
    # loop control
    epochs: int = 15,
    training_batch_size: int = 16,
    validation_batch_size: int = 16,
    # Number of validation batches scored per interval. None (default) =
    # the FULL validation set, matching the reference's scoring
    # (xforecasting AutoregressiveTraining scores the whole validation
    # loader). An int caps the pass for speed — but because the loader is
    # unshuffled, a cap scores a fixed, temporally-biased prefix of the
    # validation period, which can change early-stopping/AR-growth
    # decisions, not just the logged number. Use with care.
    validation_batches: Optional[int] = None,
    scoring_interval: int = 10,
    save_model_each_epoch: bool = False,
    # infra
    exp_dir=None,
    mesh=None,
    remat: bool = False,
    device_cache="auto",
    num_workers: int = 4,
    prefetch_factor: int = 2,
    autotune_num_workers: bool = False,
    shuffle: bool = True,
    shuffle_seed: int = 69,
    # SWAG hooks (reference finetune_swag.py:354-401)
    swag: bool = False,
    swag_model=None,
    swag_freq: int = 10,
    swa_start: int = 0,
    # member-parallel ensemble training: `params` is a member-STACKED
    # pytree (leading axis n_members); every member advances in one
    # vmapped jitted step on shared batches (the reference trains
    # DeepEnsemble members as sequential subprocesses,
    # 06_exp_DeepEnsemble.py:62-102 — measured 32x slower at HEALPix-16,
    # scripts/bench_member_parallel.py). Scalar metrics become member
    # MEANS (early stopping / AR growth act on the mean); per-member
    # losses land in info.per_member_loss. Documented deviation: members
    # share one batch stream instead of per-member shuffling.
    n_members: Optional[int] = None,
    # resume support: continue a crashed/stopped run (optimizer moments
    # preserved). The reference has no mid-training resume (SURVEY.md §5.3).
    initial_opt_state=None,
    initial_norm_state=None,
    verbose: bool = True,
):
    """Train; returns (params, opt_state, norm_state, ARTrainingInfo).

    norm_state is the BatchNorm running statistics accumulated DURING
    training with momentum 0.1 (torch semantics: every training-mode
    forward updates the running stats — reference my_models_graph.py:97-99
    + torch.nn.BatchNorm1d; the update folds inside the jitted step, see
    engine/step.py::fold_running_stats). Validation/early-stopping score
    in EVAL mode with these stats, like the reference's model.eval()
    validation. {} for models without BatchNorm.
    """
    indexer = ARIndexer.build(input_k, output_k, forecast_cycle, ar_iterations,
                              stack_most_recent_prediction)
    if optimizer is None:
        # reference: Adam(lr, eps=1e-7) (train_predict_state.py:334)
        optimizer = optax.adam(learning_rate, eps=1e-7)
    if ar_scheduler is None:
        ar_scheduler = ARScheduler(method="Constant",
                                   initial_ar_absolute_weights=[1.0] *
                                   (ar_iterations + 1),
                                   max_ar_iterations=ar_iterations)
    ar_scheduler.max_ar_iterations = ar_iterations
    if early_stopping is None:
        early_stopping = EarlyStopping(patience=3000 // max(scoring_interval, 1))

    if n_members is not None and swag:
        raise ValueError("member-parallel training does not compose with "
                         "SWAG collection (collect per member separately)")
    if early_stopping_reset_on_growth not in ("counter", "full"):
        raise ValueError("early_stopping_reset_on_growth must be 'counter' "
                         "or 'full'")

    # the jitted train step DONATES params/opt_state; copy the caller's
    # pytrees so they stay alive (e.g. for a later fresh run)
    params = jax.tree_util.tree_map(jax.numpy.array, params)
    if initial_opt_state is not None:
        opt_state = jax.tree_util.tree_map(jax.numpy.array,
                                           initial_opt_state)
    elif n_members is not None:
        opt_state = jax.vmap(optimizer.init)(params)
    else:
        opt_state = optimizer.init(params)

    # BatchNorm models: running statistics (donated through the jitted
    # step alongside params); member runs stack them per member
    has_bn = bool(getattr(model, "has_batch_norm", False))
    norm_state = {}
    if has_bn:
        norm_state = model.init_norm_state()
        if initial_norm_state is not None:
            if n_members is not None:
                # member-stacked contract (make_member_train_step): every
                # leaf carries a leading [n_members] axis. A single-model
                # norm_state (e.g. resuming an ensemble from a one-member
                # checkpoint) is broadcast per member; anything else is a
                # hard error instead of a silent in-jit shape mismatch.
                tmpl_leaf = jax.tree_util.tree_leaves(norm_state)[0]
                given_leaf = jax.tree_util.tree_leaves(initial_norm_state)[0]
                if given_leaf.shape == tmpl_leaf.shape:
                    initial_norm_state = jax.tree_util.tree_map(
                        lambda x: jax.numpy.stack([jax.numpy.asarray(x)]
                                                  * n_members),
                        initial_norm_state)
                elif given_leaf.shape != (n_members,) + tmpl_leaf.shape:
                    raise ValueError(
                        f"initial_norm_state leaf shape {given_leaf.shape} "
                        f"matches neither the single-model template "
                        f"{tmpl_leaf.shape} nor the member-stacked "
                        f"{(n_members,) + tmpl_leaf.shape}")
            norm_state = jax.tree_util.tree_map(jax.numpy.array,
                                                initial_norm_state)
        elif n_members is not None:
            norm_state = jax.tree_util.tree_map(
                lambda x: jax.numpy.stack([x] * n_members), norm_state)

    train_ds = AutoregressiveDataset(
        training_data_dynamic, indexer, data_bc=training_data_bc,
        data_static=data_static, scaler=scaler, scaler_bc=scaler_bc)
    train_ds.update_AR_iterations(ar_scheduler.current_ar_iterations)
    val_ds = None
    if validation_data_dynamic is not None:
        val_ds = AutoregressiveDataset(
            validation_data_dynamic, indexer, data_bc=validation_data_bc,
            data_static=data_static, scaler=scaler, scaler_bc=scaler_bc)
        val_ds.update_AR_iterations(ar_scheduler.current_ar_iterations)

    info = ARTrainingInfo()
    ckpt = Checkpointer(exp_dir) if exp_dir is not None else None

    # device-resident data: when the pre-scaled mirrors fit the HBM budget,
    # upload the WHOLE training/validation timelines once and gather AR
    # windows on device — per-step H2D drops from the [B, W, V, F] window
    # (~9 MB at HEALPix-16) to a [B, W] int32 index array. 'auto' caches
    # when the mirrors fit DSW_DEVICE_CACHE_BYTES (default 4 GB); stores
    # beyond it (HEALPix-64 ERA5 is ~30 GB) keep the streaming loader.
    use_cache = False
    if device_cache and train_ds.has_mirror and (
            val_ds is None or val_ds.has_mirror):
        import os
        # default 8 GB: half of a v5e's 16 GB HBM for the data cache
        # leaves the other half for params/opt/activations (the HEALPix-64
        # AR6 batch-16 remat protocol fits). The old 4 GB default silently
        # demoted the round-5 HEALPix-64 protocol (4.4 GB train+val
        # mirrors) to the streaming loader at ~10 samples/s vs ~50 cached
        # — same failure mode as round-2's DSW_PRELOAD_BYTES incident.
        budget = int(os.environ.get("DSW_DEVICE_CACHE_BYTES", 8 << 30))
        nbytes = train_ds.mirror_nbytes() + (
            val_ds.mirror_nbytes() if val_ds is not None else 0)
        use_cache = device_cache is True or nbytes <= budget
        if not use_cache and verbose:
            print(f"device_cache='auto': mirrors ({nbytes / 1e9:.1f} GB) "
                  f"exceed DSW_DEVICE_CACHE_BYTES ({budget / 1e9:.1f} GB) "
                  "— using the streaming loader", flush=True)
    elif device_cache is True:
        import warnings
        warnings.warn(
            "device_cache=True but no pre-scaled host mirror is loaded "
            "(dataset exceeds DSW_PRELOAD_BYTES or preload=False); "
            "falling back to the streaming loader", stacklevel=2)
    dev_train = put_device_dataset(train_ds, mesh) if use_cache else None
    dev_val = (put_device_dataset(val_ds, mesh)
               if use_cache and val_ds is not None else None)

    # device-resident geometry + loss-weight context (uploaded ONCE;
    # closure constants would re-upload per call on tunneled runtimes)
    ctx = make_context(model, area_weights)

    # explicit replication on a mesh: batches arrive sharded (shard_batch
    # below) and GSPMD would otherwise be free to pick param placements
    # per compiled step
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        rsh = replicated_sharding(mesh)
        # member-stacked pytrees shard their leading axis over 'member'
        psh = (NamedSharding(mesh, PartitionSpec("member"))
               if n_members is not None else rsh)
        params = jax.device_put(params, psh)
        opt_state = jax.device_put(opt_state, psh)
        if has_bn:
            norm_state = jax.device_put(norm_state, psh)
        ctx = jax.device_put(ctx, rsh)

    # per-AR-stage compiled steps (cached across growth events)
    step_cache: Dict[int, tuple] = {}

    def get_steps(n_iters: int):
        if n_iters not in step_cache:
            n_scan = n_iters + 1
            if n_members is not None:
                mk_train = (make_cached_member_train_step if use_cache
                            else make_member_train_step)
                mk_val = (make_cached_member_validation_fn if use_cache
                          else make_member_validation_fn)
            else:
                mk_train = (make_cached_train_step if use_cache
                            else make_train_step)
                mk_val = (make_cached_validation_fn if use_cache
                          else make_validation_fn)
            step_cache[n_iters] = (
                mk_train(model, indexer, optimizer, n_scan,
                         ar_training_strategy, remat=remat,
                         with_norm_state=has_bn),
                mk_val(model, indexer, n_scan, eval_mode=has_bn),
            )
        return step_cache[n_iters]

    update = 0
    stop = False
    swag_counter = 0
    # current lr for the decay levers; a resumed inject_hyperparams state
    # carries the decayed value, so read it back rather than resetting
    cur_lr = float(learning_rate)
    _hp = getattr(opt_state, "hyperparams", None)
    if _hp is not None and "learning_rate" in _hp:
        cur_lr = float(np.asarray(_hp["learning_rate"]).reshape(-1)[0])
    plateau_decays = 0
    rescues = 0
    # reset-immune loss floor for explosion detection and checkpoint
    # hygiene: early_stopping.best is CLEARED at every AR-growth reset,
    # and the round-5 gauss run showed the failure mode — the first
    # post-growth validation of an already-exploding run (loss ~1e31,
    # still finite) was recorded as the stage's "best", disarming the
    # explosion guard and letting poisoned params into the checkpoint,
    # which the eventual NaN rescue then restored. best_ever survives
    # stage resets, so explosion trips at the first post-blow-up scoring.
    best_ever = np.inf
    for epoch in range(epochs):
        if stop:
            break
        loader = AutoregressiveDataLoader(
            train_ds, batch_size=training_batch_size, shuffle=shuffle,
            shuffle_seed=shuffle_seed, num_workers=num_workers,
            prefetch_factor=prefetch_factor,
            autotune_num_workers=(autotune_num_workers and epoch == 0
                                  and not use_cache),
            epoch=epoch,
            # device upload happens in the loader's producer thread,
            # overlapped with this loop's step dispatch (prefetch_in_gpu
            # parity; see loader.py)
            transfer=lambda b: shard_batch(b, mesh))
        if autotune_num_workers and epoch == 0 and not use_cache:
            num_workers = loader.num_workers  # reuse tuned value onwards
        info.epoch_boundaries.append(update)
        t_interval = time.perf_counter()
        steps_in_interval = 0
        w = w_host = None
        # device-cached data iterates sample-INDEX batches (the window
        # gather runs on device); the streaming path iterates assembled
        # array batches
        batch_stream = (loader.iter_index_batches() if use_cache
                        else iter(loader))
        for batch in batch_stream:
            n_iters = ar_scheduler.current_ar_iterations
            train_step, _ = get_steps(n_iters)
            # AR weights change only at scoring intervals — re-upload the
            # device copy only then, not one tiny H2D dispatch per step
            w_now = ar_scheduler.padded_weights(n_iters + 1)
            if w is None or not np.array_equal(w_now, w_host):
                w_host = w_now
                w = jax.numpy.asarray(w_now)
            # No host sync here: steps are enqueued back-to-back so the
            # device pipeline hides dispatch latency; the loss scalar is
            # fetched only at scoring intervals (a per-step sync costs a
            # full tunnel RTT, ~40% of step time at HEALPix-16).
            if use_cache:
                widx = shard_window_indices(
                    train_ds.window_indices(batch), mesh)
                if has_bn:
                    (params, opt_state, norm_state, total,
                     per_iter) = train_step(params, opt_state, norm_state,
                                            dev_train, widx, w, ctx)
                else:
                    params, opt_state, total, per_iter = train_step(
                        params, opt_state, dev_train, widx, w, ctx)
            else:
                # already device-resident (loader transfer); host-side
                # time arrays are stripped — passing them into jit would
                # upload them on every call
                dev_batch = {k: batch[k] for k in TRAIN_BATCH_KEYS
                             if k in batch}
                if has_bn:
                    (params, opt_state, norm_state, total,
                     per_iter) = train_step(params, opt_state, norm_state,
                                            dev_batch, w, ctx)
                else:
                    params, opt_state, total, per_iter = train_step(
                        params, opt_state, dev_batch, w, ctx)
            update += 1
            steps_in_interval += 1

            if update % scoring_interval == 0:
                # single sync per interval; member mode reports the mean
                total = float(np.asarray(total).mean())
                dt = time.perf_counter() - t_interval
                info.iterations.append(update)
                info.training_total_loss.append(total)
                info.samples_per_sec.append(
                    training_batch_size * steps_in_interval / dt)
                steps_in_interval = 0
                # mid-epoch durability: full checkpoint every 10 scoring
                # intervals (long epochs on big datasets otherwise leave
                # hours between the per-epoch checkpoints)
                healthy = np.isfinite(total) and (
                    not np.isfinite(best_ever)
                    or total <= 100 * max(best_ever, 1e-8))
                if (ckpt is not None and healthy
                        and (update // scoring_interval) % 10 == 0):
                    # `healthy` keeps a deteriorating run from overwriting
                    # the last good checkpoint with half-exploded params —
                    # the divergence rescue below restores from here
                    ckpt.save_model(params)
                    ckpt.save_norm_state(norm_state)
                    ckpt.save_training_state(opt_state,
                                             ar_scheduler.state_dict(),
                                             early_stopping.state_dict())
                ar_scheduler.step()
                # --- validation -------------------------------------------
                val_loss = total
                per_member = None
                per_iter_val = [float(x) for x in
                                np.asarray(per_iter).reshape(
                                    -1, np.asarray(per_iter).shape[-1]
                                ).mean(axis=0)]
                if val_ds is not None:
                    _, val_fn = get_steps(n_iters)
                    vloader = AutoregressiveDataLoader(
                        val_ds, batch_size=validation_batch_size,
                        shuffle=False, num_workers=num_workers,
                        transfer=lambda b: shard_batch(b, mesh))
                    tot, per, nb = None, None, 0
                    vstream = (vloader.iter_index_batches() if use_cache
                               else iter(vloader))
                    # BatchNorm: score in EVAL mode with the running stats
                    # accumulated so far (reference validates under
                    # model.eval()) — merged into ctx, a free dict merge
                    # of device-resident arrays
                    vctx = ({**ctx, "norm_state": norm_state} if has_bn
                            else ctx)
                    for vb in vstream:
                        if use_cache:
                            vwidx = shard_window_indices(
                                val_ds.window_indices(vb), mesh)
                            vt, vp = val_fn(params, dev_val, vwidx, w, vctx)
                        else:
                            vb = {k: vb[k] for k in TRAIN_BATCH_KEYS
                                  if k in vb}
                            vt, vp = val_fn(params, vb, w, vctx)
                        # vt: scalar (or [M] per member); vp: [n_scan]
                        # (or [M, n_scan])
                        vt, vp = np.asarray(vt), np.asarray(vp)
                        tot = vt if tot is None else tot + vt
                        per = vp if per is None else per + vp
                        nb += 1
                        if (validation_batches is not None
                                and nb >= validation_batches):
                            break
                    if nb:
                        val_loss = float(tot.mean()) / nb
                        if n_members is not None:
                            per_member = [float(x) for x in tot / nb]
                        per_iter_val = [
                            float(x) for x in
                            (per / nb).reshape(-1, per.shape[-1]).mean(axis=0)]
                info.validation_iterations.append(update)
                info.validation_total_loss.append(val_loss)
                info.per_iteration_loss.append(per_iter_val)
                if per_member is not None:
                    info.per_member_loss.append(per_member)
                info.ar_weights_history.append(
                    [float(x) for x in ar_scheduler.ar_weights])
                if verbose:
                    print(f"[epoch {epoch} update {update}] "
                          f"train {total:.5f} val {val_loss:.5f} "
                          f"AR {n_iters} weights "
                          f"{np.round(ar_scheduler.ar_weights, 3)} "
                          f"({info.samples_per_sec[-1]:.1f} samples/s)")

                # --- SWAG collection ---------------------------------------
                if swag and swag_model is not None and update >= swa_start:
                    swag_counter += 1
                    if swag_counter % swag_freq == 0:
                        swag_model.collect_model(params)

                # restart the throughput clock AFTER validation /
                # checkpointing so their wall time is not charged to the
                # next interval's samples/s
                t_interval = time.perf_counter()

                # --- divergence detection / rescue -------------------------
                # RNN-strategy BPTT at reference lr can blow up in ONE
                # step at an AR-growth transition (documented in
                # config/settings.py: loss 0.03 -> 1e27 unclipped). A
                # non-finite loss poisons params and every later metric;
                # restore the last checkpoint and halve the lr (when the
                # optimizer is lr-injectable), at most 3 times.
                if np.isfinite(val_loss):
                    best_ever = min(best_ever, float(val_loss))
                exploded = (
                    np.isfinite(best_ever)
                    and val_loss > 1e4 * max(best_ever, 1e-8))
                if exploded or not (np.isfinite(val_loss)
                                    and np.isfinite(total)):
                    can_rescue = (
                        ckpt is not None and ckpt.has_checkpoint()
                        and rescues < 3
                        and getattr(opt_state, "hyperparams", None)
                        is not None)
                    if can_rescue:
                        rescues += 1
                        cur_lr *= 0.5
                        params = jax.tree_util.tree_map(
                            jax.numpy.array, ckpt.load_model(params))
                        opt_state, _ = ckpt.load_training_state(opt_state)
                        opt_state = _set_opt_lr(opt_state, cur_lr)
                        if has_bn:
                            restored = ckpt.load_norm_state(norm_state)
                            if restored is not None:
                                norm_state = jax.tree_util.tree_map(
                                    jax.numpy.array, restored)
                        early_stopping.reset()
                        kind = "exploding" if exploded else "non-finite"
                        print(f"  !! {kind} loss at update {update}: "
                              f"restored last checkpoint, lr -> "
                              f"{cur_lr:.2e} (rescue {rescues}/3)",
                              flush=True)
                        break     # rebuild loader; continue training
                    raise FloatingPointError(
                        f"training diverged "
                        f"({'exploding' if exploded else 'non-finite'} "
                        f"loss at update {update}) and no rescue is possible "
                        f"(checkpoint={ckpt is not None}, lr-injectable="
                        f"{getattr(opt_state, 'hyperparams', None) is not None}"
                        f", rescues={rescues}/3). Set training_settings."
                        "gradient_clipping (e.g. 1.0) — RNN-strategy AR "
                        "growth at reference lr diverges without it.")

                # --- early stopping / AR growth ----------------------------
                # "full" mode suspends plateau judgement while the newest
                # AR weight is still ramping: the loss definition is
                # non-stationary (val loss RISES as harder leadtimes gain
                # weight), so patience would fire on schedule rather than
                # on convergence. Checks resume once weights saturate.
                if (early_stopping_reset_on_growth == "full"
                        and ar_scheduler.ramp_in_progress):
                    continue
                if early_stopping.check(val_loss):
                    if ar_scheduler.can_update():
                        ar_scheduler.update()
                        if ar_training_strategy == "AR":
                            # freeze all previously grown weights
                            ar_scheduler.fixed_ar_weights |= set(
                                range(len(ar_scheduler.absolute_weights) - 1))
                        if early_stopping_reset_on_growth == "full":
                            early_stopping.reset()
                        else:
                            early_stopping.reset_counter()
                        if lr_decay_on_growth != 1.0:
                            cur_lr *= float(lr_decay_on_growth)
                            opt_state = _set_opt_lr(opt_state, cur_lr)
                        info.ar_growth_events.append(update)
                        train_ds.update_AR_iterations(
                            ar_scheduler.current_ar_iterations)
                        if val_ds is not None:
                            val_ds.update_AR_iterations(
                                ar_scheduler.current_ar_iterations)
                        if verbose:
                            print(f"  -> AR iterations grown to "
                                  f"{ar_scheduler.current_ar_iterations}"
                                  + (f" (lr -> {cur_lr:.2e})"
                                     if lr_decay_on_growth != 1.0 else ""))
                        break  # rebuild loader with new sample set
                    if (lr_plateau_decay
                            and plateau_decays < lr_plateau_max_decays):
                        # final AR stage: ReduceLROnPlateau instead of stop
                        plateau_decays += 1
                        cur_lr *= float(lr_plateau_decay)
                        opt_state = _set_opt_lr(opt_state, cur_lr)
                        early_stopping.reset()
                        if verbose:
                            print(f"  -> plateau at max AR: lr decayed to "
                                  f"{cur_lr:.2e} "
                                  f"({plateau_decays}/{lr_plateau_max_decays})")
                        continue
                    stop = True
                    if verbose:
                        print("  -> early stopping")
                    break
        if ckpt is not None and save_model_each_epoch:
            ckpt.save_model(params, name=f"model_epoch_{epoch}.npz")
        # crash durability: a full checkpoint (weights + optimizer moments
        # + scheduler/early-stopping state) lands after every epoch so
        # --resume recovers interrupted runs (the reference can only
        # restart from scratch, SURVEY.md §5.3)
        if ckpt is not None:
            ckpt.save_model(params)
            ckpt.save_norm_state(norm_state)
            ckpt.save_training_state(opt_state, ar_scheduler.state_dict(),
                                     early_stopping.state_dict())

    if ckpt is not None:
        ckpt.save_model(params)
        ckpt.save_norm_state(norm_state)
        ckpt.save_training_state(opt_state, ar_scheduler.state_dict(),
                                 early_stopping.state_dict())
        info.save(Path(ckpt.exp_dir) / "training_info" / "ar_training_info.json")
    return params, opt_state, norm_state, info
