"""Offline evaluation harness (SSP-3D / 3DPW style).

The reference ships `EvalMetricsTracker` but no driver
(`metrics/eval_metrics_tracker.py`, SURVEY.md §4.4) — this is the missing
driver: batched proxy construction -> jitted prediction rollout -> on-device
metric math -> tracker aggregation, with optional gendered body models
(SSP-3D protocol) and silhouette IoU via re-rendering predictions.

Dataset npz schema (SSP-3D-like):
  poses (N, 72), shapes (N, 10), genders (N,) in {'m','f','n'},
  silhouettes (N, H, W) optional, joints2D (N, 17, 2|3) optional.
When silhouettes/joints are absent they are synthesised from the GT params
via the renderer (synthetic-eval mode, used by tests/bench).
"""

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from straps_tpu.config import PredictConfig
from straps_tpu.geometry import get_intrinsics_matrix
from straps_tpu.metrics import EvalMetricsTracker, compute_per_frame_metrics
from straps_tpu.predict.pipeline import make_predict_fn, load_regressor_variables
from straps_tpu.predict.proxy import batch_silhouettes_joints_to_proxies
from straps_tpu.render import render_silhouette
from straps_tpu.smpl import load_assets, smpl_forward, smpl_forward_axis_angle
from straps_tpu.train.synthetic import select_joint_sets


def load_eval_npz(path: str) -> Dict[str, np.ndarray]:
    data = dict(np.load(path, allow_pickle=True))
    assert "poses" in data and "shapes" in data, "eval npz needs poses/shapes"
    return data


def synthesise_proxy_inputs(poses: np.ndarray, shapes: np.ndarray, assets,
                            img_wh: int, focal_length: float = None,
                            cam_t=(0.0, 0.2, 42.0)
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """Render GT meshes to silhouettes + project GT joints (synthetic-eval
    mode for when a dataset ships no images/detections)."""
    B = poses.shape[0]
    if focal_length is None:
        # Reference convention: focal 5000 at 256px; scale with resolution.
        focal_length = 5000.0 * img_wh / 256.0
    K = jnp.asarray(get_intrinsics_matrix(img_wh, img_wh, focal_length))
    t = jnp.tile(jnp.asarray(cam_t, jnp.float32), (B, 1))
    out = smpl_forward_axis_angle(assets, jnp.asarray(shapes),
                                  jnp.asarray(poses))
    sil, _ = render_silhouette(out.vertices, t, K, assets.faces, img_wh,
                               backend="xla")
    from straps_tpu.geometry import perspective_project
    _, coco = select_joint_sets(out.joints)
    j2d = perspective_project(coco, jnp.eye(3), t, K)
    return np.asarray(sil), np.asarray(j2d)


def run_evaluation(dataset: Dict[str, np.ndarray], cfg: PredictConfig,
                   metrics=("pves", "pves_sc", "pves_pa", "pve-ts",
                            "pve-ts_sc", "mpjpes", "mpjpes_sc", "mpjpes_pa",
                            "silhouette_ious"),
                   batch_size: int = 8,
                   save_per_frame: bool = False,
                   save_path: Optional[str] = None) -> Dict[str, float]:
    """Evaluate a checkpoint on an SSP-3D/3DPW-style dataset."""
    assets = load_assets(cfg.smpl_dir)
    # Gendered models when available (SSP-3D protocol); neutral otherwise.
    gender_assets = {"n": assets}
    if cfg.smpl_dir is not None:
        for g, name in (("m", "male"), ("f", "female")):
            try:
                gender_assets[g] = load_assets(cfg.smpl_dir, gender=name)
            except (FileNotFoundError, OSError):
                pass

    model, variables = load_regressor_variables(cfg, assets)
    predict = make_predict_fn(model, variables, assets, cfg.img_wh)

    poses = np.asarray(dataset["poses"], np.float32)
    shapes = np.asarray(dataset["shapes"], np.float32)
    genders = dataset.get("genders", np.asarray(["n"] * len(poses)))
    if "silhouettes" in dataset and "joints2D" in dataset:
        sils = np.asarray(dataset["silhouettes"], np.float32)
        j2d = np.asarray(dataset["joints2D"], np.float32)[:, :, :2]
    else:
        sils, j2d = synthesise_proxy_inputs(poses, shapes, assets, cfg.img_wh)

    img_wh = cfg.img_wh
    K = jnp.asarray(get_intrinsics_matrix(img_wh, img_wh,
                                          5000.0 * img_wh / 256.0))
    want_iou = "silhouette_ious" in metrics
    tracker = EvalMetricsTracker(list(metrics), img_wh=img_wh,
                                 save_path=save_path,
                                 save_per_frame_metrics=save_per_frame)

    n = len(poses)
    for start in range(0, n - n % batch_size, batch_size):
        sl = slice(start, start + batch_size)
        proxies, _ = batch_silhouettes_joints_to_proxies(
            jnp.asarray(sils[sl]), jnp.asarray(j2d[sl]), img_wh)
        pred = predict(proxies)

        # Ground truth through the (gendered) body model.
        g = str(np.asarray(genders[sl])[0]).lower()[:1]
        ga = gender_assets.get(g, assets)
        gt = smpl_forward_axis_angle(ga, jnp.asarray(shapes[sl]),
                                     jnp.asarray(poses[sl]))
        gt_reposed = smpl_forward(ga, jnp.asarray(shapes[sl]))
        gt_h36mlsp, _ = select_joint_sets(gt.joints)
        pred_h36mlsp, _ = select_joint_sets(pred["joints3d_all"])

        pred_dict = {"verts": pred["verts"], "joints3D": pred_h36mlsp}
        target_dict = {"verts": gt.vertices, "joints3D": gt_h36mlsp}
        if want_iou:
            pred_sil, _ = render_silhouette(
                pred["verts"], jnp.asarray(pred["cam_t"]), K, assets.faces,
                img_wh, backend="xla")
            gt_sil, _ = render_silhouette(
                gt.vertices, jnp.tile(jnp.asarray([0.0, 0.2, 42.0]),
                                      (batch_size, 1)), K, ga.faces, img_wh,
                backend="xla")
            pred_dict["silhouettes"] = pred_sil
            target_dict["silhouettes"] = gt_sil

        pf = compute_per_frame_metrics(
            tuple(metrics), pred_dict, target_dict, img_wh,
            pred_reposed=pred["reposed_verts"],
            target_reposed=gt_reposed.vertices)
        tracker.update_per_batch({k: np.asarray(v) for k, v in pf.items()},
                                 batch_size)
    return tracker.compute_final_metrics()
