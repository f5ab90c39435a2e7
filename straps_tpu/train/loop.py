"""Epoch training loop: datasets -> jitted steps -> tracking -> checkpoints.

Orchestration parity with `train/train_synthetic_otf_rendering.py`:
train epoch with augmentation, val epoch without, metric tracking with the
all-must-improve best gate (`:353-363`), full-state checkpoint every
`epochs_per_save` epochs including the learned loss weights (`:365-380`),
and resume that truncates metric history (`run_train.py:84-88, 204-211`).

TPU-native differences: batches are sharded over the mesh `data` axis and the
whole step is one XLA executable; checkpoints are orbax pytrees (with a
torch-state-dict exporter in `straps_tpu.models.convert` for reference
compatibility).
"""

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from straps_tpu.config import TrainConfig
from straps_tpu.data import SyntheticTrainingDataset, epoch_batches
from straps_tpu.losses import init_loss_log_vars
from straps_tpu.metrics import TrainingTracker
from straps_tpu.models import build_regressor
from straps_tpu.parallel import make_mesh, shard_batch, replicate
from straps_tpu.smpl import load_assets
from straps_tpu.train.state import TrainState, create_train_state, make_optimizer
from straps_tpu.train.step import make_train_step, make_val_step
from straps_tpu.utils.checkpoints import save_checkpoint, restore_checkpoint
from straps_tpu.utils.profiling import StepTimer


def build_training(cfg: TrainConfig, assets=None):
    """Construct (model, assets, state, tx, train_step, val_step, mesh)."""
    if assets is None:
        assets = load_assets(cfg.smpl_dir)
    model = build_regressor(assets.mean_pose_6d, assets.mean_shape,
                            in_channels=cfg.model.resnet_in_channels,
                            resnet_layers=cfg.model.resnet_layers,
                            ief_iters=cfg.model.ief_iters,
                            compute_dtype=cfg.model.compute_dtype)
    variables = model.init(jax.random.PRNGKey(cfg.seed),
                           jnp.zeros((1, cfg.img_wh, cfg.img_wh,
                                      cfg.model.resnet_in_channels)),
                           train=False)
    log_vars = init_loss_log_vars(cfg.losses_on, cfg.init_loss_weights)
    tx = make_optimizer(cfg.lr)
    state = create_train_state(variables["params"], variables["batch_stats"],
                               log_vars, tx)
    mesh = make_mesh(cfg.data_parallel_devices)
    train_step = make_train_step(model, assets, cfg, tx, mesh=mesh)
    val_step = make_val_step(model, assets, cfg, mesh=mesh)
    return model, assets, state, tx, train_step, val_step, mesh


def train(cfg: TrainConfig, assets=None,
          max_steps_per_epoch: Optional[int] = None,
          verbose: bool = True) -> Tuple[TrainState, dict, TrainingTracker]:
    """Run the full training; returns (final state, best params, tracker)."""
    model, assets, state, tx, train_step, val_step, mesh = build_training(
        cfg, assets)

    train_ds = SyntheticTrainingDataset(cfg.train_path, cfg.params_from)
    val_ds = SyntheticTrainingDataset(cfg.val_path, cfg.params_from)

    os.makedirs(os.path.dirname(cfg.log_path) or ".", exist_ok=True)
    os.makedirs(os.path.dirname(cfg.model_save_path) or ".", exist_ok=True)

    current_epoch = 0
    best_epoch_val_metrics = {m: np.inf for m in cfg.save_val_metrics}
    best_epoch = 0
    best_params = jax.tree_util.tree_map(np.asarray, state.params)
    load_logs = False
    if cfg.resume_from_epoch is not None:
        ckpt_path = f"{cfg.model_save_path}_epoch{cfg.resume_from_epoch}"
        restored = restore_checkpoint(ckpt_path, state)
        state = restored["state"]
        current_epoch = int(restored["epoch"]) + 1
        best_epoch = int(restored["best_epoch"])
        best_params = restored["best_params"]
        saved_best = restored["best_epoch_val_metrics"]
        best_epoch_val_metrics = {
            m: float(saved_best[m]) if m in saved_best else np.inf
            for m in cfg.save_val_metrics}
        load_logs = True

    state = replicate(state, mesh)
    tracker = TrainingTracker(cfg.losses_on, cfg.metrics_to_track,
                              cfg.log_path, load_logs=load_logs,
                              current_epoch=current_epoch)
    rng = np.random.RandomState(cfg.seed + current_epoch)
    timer = StepTimer()

    for epoch in range(current_epoch, cfg.num_epochs):
        tracker.initialise_loss_metric_sums()
        timer.reset()  # per-epoch means (first epoch includes compiles)
        key = jax.random.PRNGKey(cfg.seed * 100003 + epoch)

        for i, b in enumerate(epoch_batches(train_ds, cfg.batch_size, rng)):
            if max_steps_per_epoch is not None and i >= max_steps_per_epoch:
                break
            key, sub = jax.random.split(key)
            batch = shard_batch({"pose": b["pose"], "shape": b["shape"]}, mesh)
            with timer.measure("train_step"):
                state, loss, task_losses, per_frame = train_step(
                    state, sub, batch["pose"], batch["shape"])
                # One host transfer for all scalars/metrics (per-leaf
                # float() would cost a device round trip each on tunneled
                # TPUs).  The pull doubles as the completion barrier, so
                # it belongs INSIDE the timed block: jit dispatch alone
                # returns futures in ~1 ms.
                loss, task_losses, per_frame = jax.device_get(
                    (loss, task_losses, per_frame))
            tracker.update_per_batch("train", float(loss), task_losses,
                                     per_frame, b["pose"].shape[0])

        # Val covers EVERY sample (the reference DataLoader keeps the tail,
        # `train_synthetic_otf_rendering.py:245-348`): the partial last
        # batch is padded to the static jit shape by cycling samples;
        # per-frame metrics are trimmed back to the real count.  The tail
        # batch's (scalar) losses average over the cycled duplicates —
        # real samples counted twice, not padding garbage.
        for i, b in enumerate(epoch_batches(val_ds, cfg.batch_size, rng,
                                            shuffle=False, drop_last=False)):
            if max_steps_per_epoch is not None and i >= max_steps_per_epoch:
                break
            key, sub = jax.random.split(key)
            n_real = b["pose"].shape[0]
            if n_real < cfg.batch_size:
                fill = np.arange(cfg.batch_size - n_real) % n_real
                b = {k: np.concatenate([v, v[fill]]) for k, v in b.items()}
            batch = shard_batch({"pose": b["pose"], "shape": b["shape"]}, mesh)
            with timer.measure("val_step"):
                loss, task_losses, per_frame = val_step(
                    state, sub, batch["pose"], batch["shape"])
                loss, task_losses, per_frame = jax.device_get(
                    (loss, task_losses, per_frame))
            per_frame = {k: np.asarray(v)[:n_real]
                         for k, v in per_frame.items()}
            tracker.update_per_batch("val", float(loss), task_losses,
                                     per_frame, n_real)

        tracker.update_per_epoch()
        if verbose:
            print(f"epoch {epoch}: train_loss="
                  f"{tracker.history['train_losses'][-1]:.5f} val_loss="
                  f"{tracker.history['val_losses'][-1]:.5f} "
                  + " ".join(f"val_{m}={tracker.history['val_' + m][-1]:.5f}"
                             for m in cfg.save_val_metrics)
                  + f" ({timer.summary()})")

        if tracker.determine_save_model_weights_this_epoch(
                cfg.save_val_metrics, best_epoch_val_metrics):
            for m in cfg.save_val_metrics:
                best_epoch_val_metrics[m] = tracker.history[f"val_{m}"][-1]
            best_params = jax.tree_util.tree_map(np.asarray, state.params)
            best_epoch = epoch

        if (epoch % cfg.epochs_per_save == 0
                or epoch == cfg.num_epochs - 1):
            # Also save at the FINAL epoch: with the reference's
            # boundary-only cadence (`:365-380`) a 100-epoch run's last
            # save is epoch 90 and any best weights found in 91-99 exist
            # only in the returned value, which CLI callers discard.
            save_checkpoint(
                f"{cfg.model_save_path}_epoch{epoch}",
                state=state, epoch=epoch, best_epoch=best_epoch,
                best_params=best_params,
                best_epoch_val_metrics={k: float(v) for k, v in
                                        best_epoch_val_metrics.items()},
                # Recorded so predict/eval auto-select the proxy heatmap
                # distribution this model was trained on (PredictConfig
                # heatmap_mode='auto').
                heatmap_mode=cfg.heatmap_mode)

    # Best-epoch record for callers (the CLI report): history[-1] is the
    # LAST epoch's value, not the best epoch's.
    tracker.best_epoch = best_epoch
    tracker.best_epoch_val_metrics = {k: float(v) for k, v in
                                      best_epoch_val_metrics.items()}
    return state, best_params, tracker
