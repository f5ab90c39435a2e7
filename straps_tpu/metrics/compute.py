"""On-device metric math (batched jnp).

Implements every metric family of the reference trackers
(`metrics/train_loss_and_metrics_tracker.py:128-213`,
`metrics/eval_metrics_tracker.py:45-190`) as one jit-friendly function that
returns *per-frame* values; trackers aggregate on the host.  Alignment
variants: `_sc` = scale+translation correction, `_pa` = Procrustes
(batched SVD on device — the reference loops numpy SVD per sample).
"""

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from straps_tpu.geometry.alignment import (
    compute_similarity_transform, scale_and_translation_transform,
)
from straps_tpu.geometry.joints import undo_keypoint_normalisation

# All supported metric names (reference `run_train.py:63-64`).
ALL_METRICS = ("pves", "pves_sc", "pves_pa", "pve-ts", "pve-ts_sc", "pve-ts_pa",
               "mpjpes", "mpjpes_sc", "mpjpes_pa", "pose_mses", "shape_mses",
               "joints2D_l2es", "silhouette_ious")


def _mean_norm(a, b):
    """Per-frame mean Euclidean error: (B, N, 3)/(B, N, 2) -> (B,)."""
    return jnp.mean(jnp.linalg.norm(a - b, axis=-1), axis=-1)


def compute_per_frame_metrics(metrics: Tuple[str, ...],
                              pred: Dict[str, jnp.ndarray],
                              target: Dict[str, jnp.ndarray],
                              img_wh: int,
                              pred_reposed: Optional[jnp.ndarray] = None,
                              target_reposed: Optional[jnp.ndarray] = None,
                              joints2d_pred_normalised: bool = True
                              ) -> Dict[str, jnp.ndarray]:
    """Per-frame metric values.

    Args:
      metrics: static tuple of metric names to compute.
      pred/target: dicts with keys among verts (B,V,3), joints3D (B,14,3),
        joints2D (B,J,2), pose_params_rot_matrices (B,24,3,3),
        shape_params (B,10), silhouettes (B,H,W).
      pred_reposed/target_reposed: (B,V,3) T-pose meshes for pve-ts*.
      joints2d_pred_normalised: if True, pred joints2D are in [-1,1] space
        and get un-normalised before the pixel L2 (training-tracker
        behaviour, `train_loss_and_metrics_tracker.py:204-210`).
    Returns:
      {metric: (B,) per-frame values}; for 'silhouette_ious' additionally
      'silhouette_tp/fp/fn/tn' per-frame (B,) counts (summed by trackers —
      per-frame so callers can drop padded tail samples before aggregation).
    """
    out = {}
    if "pves" in metrics:
        out["pves"] = _mean_norm(pred["verts"], target["verts"])
    if "pves_sc" in metrics:
        aligned = scale_and_translation_transform(pred["verts"], target["verts"])
        out["pves_sc"] = _mean_norm(aligned, target["verts"])
    if "pves_pa" in metrics:
        aligned = compute_similarity_transform(pred["verts"], target["verts"])
        out["pves_pa"] = _mean_norm(aligned, target["verts"])
    if "pve-ts" in metrics:
        out["pve-ts"] = _mean_norm(pred_reposed, target_reposed)
    if "pve-ts_sc" in metrics:
        aligned = scale_and_translation_transform(pred_reposed, target_reposed)
        out["pve-ts_sc"] = _mean_norm(aligned, target_reposed)
    if "pve-ts_pa" in metrics:
        aligned = compute_similarity_transform(pred_reposed, target_reposed)
        out["pve-ts_pa"] = _mean_norm(aligned, target_reposed)
    if "mpjpes" in metrics:
        out["mpjpes"] = _mean_norm(pred["joints3D"], target["joints3D"])
    if "mpjpes_sc" in metrics:
        aligned = scale_and_translation_transform(pred["joints3D"],
                                                  target["joints3D"])
        out["mpjpes_sc"] = _mean_norm(aligned, target["joints3D"])
    if "mpjpes_pa" in metrics:
        aligned = compute_similarity_transform(pred["joints3D"],
                                               target["joints3D"])
        out["mpjpes_pa"] = _mean_norm(aligned, target["joints3D"])
    if "pose_mses" in metrics:
        d = pred["pose_params_rot_matrices"] - target["pose_params_rot_matrices"]
        out["pose_mses"] = jnp.mean(d ** 2, axis=(1, 2, 3))
    if "shape_mses" in metrics:
        d = pred["shape_params"] - target["shape_params"]
        out["shape_mses"] = jnp.mean(d ** 2, axis=-1)
    if "joints2D_l2es" in metrics:
        p = pred["joints2D"]
        if joints2d_pred_normalised:
            p = undo_keypoint_normalisation(p, img_wh)
        out["joints2D_l2es"] = _mean_norm(p, target["joints2D"])
    if "silhouette_ious" in metrics:
        ps = pred["silhouettes"] != 0
        ts = target["silhouettes"] != 0
        tp = jnp.sum(ps & ts, axis=(1, 2)).astype(jnp.float32)
        fp = jnp.sum(ps & ~ts, axis=(1, 2)).astype(jnp.float32)
        fn = jnp.sum(~ps & ts, axis=(1, 2)).astype(jnp.float32)
        tn = jnp.sum(~ps & ~ts, axis=(1, 2)).astype(jnp.float32)
        out["silhouette_ious"] = tp / jnp.maximum(tp + fp + fn, 1.0)
        out["silhouette_tp"] = tp
        out["silhouette_fp"] = fp
        out["silhouette_fn"] = fn
        out["silhouette_tn"] = tn
    return out
