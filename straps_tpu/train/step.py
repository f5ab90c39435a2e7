"""Jitted, mesh-sharded train / validation steps.

One jitted program per step (SURVEY.md §7 design stance): synthetic data
generation, regressor forward, SMPL forward on predictions, multi-task loss,
backward, Adam update and metric math all fuse into a single XLA executable.
Sharding: batch over the mesh `data` axis, state replicated — XLA inserts
the ICI gradient all-reduce automatically.
"""

import jax

from straps_tpu.config import TrainConfig
from straps_tpu.geometry import orthographic_project, rot6d_to_rotmat
from straps_tpu.losses import multi_task_loss
from straps_tpu.metrics import compute_per_frame_metrics
from straps_tpu.smpl import SmplAssets, smpl_forward
from straps_tpu.train.state import TrainState
from straps_tpu.train.synthetic import (
    SyntheticBatch, generate_synthetic_batch, select_joint_sets,
)


def _forward_and_dicts(model, params, batch_stats, log_vars,
                       batch: SyntheticBatch, assets: SmplAssets,
                       cfg: TrainConfig, train: bool):
    """Regressor forward + pred SMPL + loss/metric dicts.

    Mirrors the forward section of the reference training loop
    (`train_synthetic_otf_rendering.py:184-231`).
    """
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        (cam, pose6d, shape), mutated = model.apply(
            variables, batch.proxy, train=True, mutable=["batch_stats"])
        new_batch_stats = mutated["batch_stats"]
    else:
        cam, pose6d, shape = model.apply(variables, batch.proxy, train=False)
        new_batch_stats = batch_stats

    B = cam.shape[0]
    rotmats = rot6d_to_rotmat(pose6d.reshape(B, 24, 6))  # (B, 24, 3, 3)
    pred = smpl_forward(assets, shape, rotmats[:, 1:], rotmats[:, 0:1],
                        precision=cfg.smpl_precision)
    pred_reposed = smpl_forward(assets, shape, precision=cfg.smpl_precision)
    pred_h36mlsp, pred_coco = select_joint_sets(pred.joints)
    pred_joints2d = orthographic_project(pred_coco, cam)

    pred_dict = {
        "verts": pred.vertices,
        "joints2D": pred_joints2d,
        "joints3D": pred_h36mlsp,
        "pose_params_rot_matrices": rotmats,
        "shape_params": shape,
    }
    target_dict = {
        "verts": batch.target_verts,
        "joints2D": batch.target_joints2d_coco,
        "joints3D": batch.target_joints_h36mlsp,
        "pose_params_rot_matrices": batch.target_pose_rotmats,
        "shape_params": batch.target_shape,
        "vis": batch.target_vis,
    }
    if "silhouette" in log_vars:
        # Differentiable silhouette supervision (beyond the reference, whose
        # silhouette task is vestigial): soft vertex-splat of the predicted
        # mesh vs the downsampled target silhouette, both in cropped space.
        from straps_tpu.render.soft_silhouette import soft_silhouette_from_wp
        wh = cfg.silhouette_loss_wh
        pred_dict["silhouettes"] = soft_silhouette_from_wp(
            pred.vertices, cam, wh)
        B_ = batch.proxy.shape[0]
        target_dict["silhouettes"] = jax.image.resize(
            batch.proxy[..., 0], (B_, wh, wh), method="linear")
    loss, task_losses = multi_task_loss(log_vars, target_dict, pred_dict,
                                        cfg.img_wh)
    return (loss, (task_losses, pred_dict, target_dict, pred_reposed.vertices,
                   new_batch_stats))


def _assets_as_device_args(assets: SmplAssets, mesh):
    """Place SMPL assets on device ONCE so they ride each step as ordinary
    jit arguments.  Closing the jit over them would bake ~17MB of posedirs
    into the executable as constants (CLAUDE.md: the axon remote-compile
    service rejects big constant-laden programs with HTTP 413)."""
    if mesh is not None:
        from straps_tpu.parallel.mesh import replicate
        return replicate(assets, mesh)
    return jax.device_put(assets)


def make_train_step(model, assets: SmplAssets, cfg: TrainConfig, tx,
                    mesh=None):
    """Build the jitted training step.

    Returns fn(state, key, pose (B,72), shape (B,10)) ->
      (new_state, loss, task_losses, per_frame_metrics)
    """
    metrics = tuple(cfg.metrics_to_track)
    assets_dev = _assets_as_device_args(assets, mesh)

    @jax.jit
    def train_step(state: TrainState, key, pose, shape, assets: SmplAssets):
        batch = generate_synthetic_batch(key, pose, shape, assets, cfg,
                                         augment=True)

        def loss_fn(trainable):
            params, log_vars = trainable
            return _forward_and_dicts(model, params, state.batch_stats,
                                      log_vars, batch, assets, cfg, train=True)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, aux), grads = grad_fn((state.params, state.log_vars))
        task_losses, pred_dict, target_dict, pred_reposed, new_bs = aux
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           (state.params, state.log_vars))
        new_params, new_log_vars = jax.tree_util.tree_map(
            lambda p, u: p + u, (state.params, state.log_vars), updates)
        new_state = state.replace(params=new_params, log_vars=new_log_vars,
                                  batch_stats=new_bs,
                                  opt_state=new_opt_state,
                                  step=state.step + 1)
        per_frame = compute_per_frame_metrics(
            metrics, pred_dict, target_dict, cfg.img_wh,
            pred_reposed=pred_reposed,
            target_reposed=batch.target_reposed_verts)
        return new_state, loss, task_losses, per_frame

    def step(state, key, pose, shape):
        return train_step(state, key, pose, shape, assets_dev)

    # Expose the underlying jitted function (assets as an ARGUMENT, the
    # HTTP-413-safe form) so tooling — e.g. profile_stages' roofline
    # lower()/cost_analysis — can reuse the exact compiled program instead
    # of re-jitting this closure (which would bake assets in as constants
    # and force a second full compile).
    step.jitted = train_step
    step.assets_dev = assets_dev
    return step


def make_val_step(model, assets: SmplAssets, cfg: TrainConfig, mesh=None):
    """Validation step: no augmentation, fixed mean camera, no update
    (`train_synthetic_otf_rendering.py:245-348`)."""
    metrics = tuple(cfg.metrics_to_track)
    assets_dev = _assets_as_device_args(assets, mesh)

    @jax.jit
    def val_step(state: TrainState, key, pose, shape, assets: SmplAssets):
        batch = generate_synthetic_batch(key, pose, shape, assets, cfg,
                                         augment=False)
        loss, aux = _forward_and_dicts(model, state.params, state.batch_stats,
                                       state.log_vars, batch, assets, cfg,
                                       train=False)
        task_losses, pred_dict, target_dict, pred_reposed, _ = aux
        per_frame = compute_per_frame_metrics(
            metrics, pred_dict, target_dict, cfg.img_wh,
            pred_reposed=pred_reposed,
            target_reposed=batch.target_reposed_verts)
        return loss, task_losses, per_frame

    return lambda state, key, pose, shape: val_step(
        state, key, pose, shape, assets_dev)
