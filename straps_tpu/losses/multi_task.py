"""Homoscedastic-uncertainty-weighted multi-task loss.

Re-design of the reference `HomoscedasticUncertaintyWeightedMultiTaskLoss`
(`losses/multi_task_loss.py:7-119`): per-task MSE losses weighted by learned
log-variances (Kendall et al.), `total += mse * exp(-logvar) + logvar`.
The log-variances live in a plain pytree that the caller optimises jointly
with the network parameters — the reference keeps them as nn.Parameters in
the criterion and feeds them to the same Adam (`run_train.py:200-201`).

joints2D labels are normalised to [-1, 1] space and masked by per-joint
visibility exactly like `multi_task_loss.py:83-95`.
"""

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from straps_tpu.geometry.joints import normalise_keypoints

ALL_TASKS = ("verts", "joints2D", "joints3D", "pose_params", "shape_params",
             "silhouette")


def init_loss_log_vars(losses_on, init_loss_weights: Optional[dict] = None,
                       eps: float = 1e-6) -> Dict[str, jnp.ndarray]:
    """Initial log-variances: -log(w + eps), or 0 without init weights
    (`multi_task_loss.py:30-44`).  Only active tasks appear in the pytree, so
    the optimiser updates exactly the weights the reference marks trainable."""
    out = {}
    for task in losses_on:
        if init_loss_weights is not None:
            out[task] = jnp.asarray(
                -np.log(init_loss_weights[task] + eps), jnp.float32)
        else:
            out[task] = jnp.asarray(0.0, jnp.float32)
    return out


def _mse(pred, target):
    return jnp.mean((pred - target) ** 2)


def multi_task_loss(log_vars: Dict[str, jnp.ndarray],
                    labels: Dict[str, jnp.ndarray],
                    outputs: Dict[str, jnp.ndarray],
                    img_wh: int) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Compute total weighted loss + per-task dict.

    Args:
      log_vars: {task: scalar} learned log-variances (the active task set).
      labels/outputs: dicts with keys among
        verts (B,V,3), joints2D (B,J,2), joints3D (B,14,3),
        pose_params_rot_matrices (B,24,3,3), shape_params (B,10),
        silhouettes (B,H,W); labels may carry 'vis' (B,J) bool.
      img_wh: image size for joints2D label normalisation.
    Returns:
      (total scalar, {task: weighted task loss}) — task entries match the
      reference's `loss_dict` (mse * exp(-logvar)).
    """
    total = jnp.asarray(0.0, jnp.float32)
    loss_dict = {}

    def add(task, mse):
        nonlocal total
        lv = log_vars[task]
        weighted = mse * jnp.exp(-lv)
        total += weighted + lv
        loss_dict[task] = weighted

    if "verts" in log_vars:
        add("verts", _mse(outputs["verts"], labels["verts"]))

    if "joints2D" in log_vars:
        label = normalise_keypoints(labels["joints2D"], img_wh)
        pred = outputs["joints2D"]
        if "vis" in labels:
            vis = labels["vis"].astype(pred.dtype)[..., None]   # (B, J, 1)
            count = jnp.maximum(jnp.sum(vis) * 2.0, 1.0)
            mse = jnp.sum(((pred - label) ** 2) * vis) / count
        else:
            mse = _mse(pred, label)
        add("joints2D", mse)

    if "joints3D" in log_vars:
        add("joints3D", _mse(outputs["joints3D"], labels["joints3D"]))

    if "shape_params" in log_vars:
        add("shape_params", _mse(outputs["shape_params"], labels["shape_params"]))

    if "pose_params" in log_vars:
        add("pose_params", _mse(outputs["pose_params_rot_matrices"],
                                labels["pose_params_rot_matrices"]))

    if "silhouette" in log_vars:
        add("silhouette", _mse(outputs["silhouettes"], labels["silhouettes"]))

    return total, loss_dict
