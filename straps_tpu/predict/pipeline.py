"""Batched inference rollout: proxies -> SMPL predictions.

The reference predicts image-by-image with per-image GPU round trips
(`predict/predict_3D.py:100-183`); here the whole folder is batched into one
jitted rollout (regressor -> rot6d -> SMPL -> reposed SMPL -> projection).
"""

import glob
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from straps_tpu import constants as C
from straps_tpu.config import PredictConfig
from straps_tpu.geometry import (
    orthographic_project, rot6d_to_rotmat, undo_keypoint_normalisation,
    weak_perspective_to_camera_translation,
)
from straps_tpu.models import build_regressor, load_reference_checkpoint
from straps_tpu.predict.proxy import batch_silhouettes_joints_to_proxies
from straps_tpu.smpl import load_assets, smpl_forward
from straps_tpu.train.synthetic import select_joint_sets


def make_predict_fn(model, variables, assets, img_wh: int):
    """Jitted proxy -> prediction rollout."""

    @jax.jit
    def predict(proxies):
        cam, pose6d, shape = model.apply(variables, proxies, train=False)
        B = cam.shape[0]
        rotmats = rot6d_to_rotmat(pose6d.reshape(B, 24, 6))
        out = smpl_forward(assets, shape, rotmats[:, 1:], rotmats[:, 0:1])
        reposed = smpl_forward(assets, shape)
        _, coco = select_joint_sets(out.joints)
        joints2d_norm = orthographic_project(coco, cam)
        joints2d = undo_keypoint_normalisation(joints2d_norm, img_wh)
        cam_t = weak_perspective_to_camera_translation(cam, 5000.0, img_wh)
        return {
            "cam_wp": cam, "cam_t": cam_t, "pose_rotmats": rotmats,
            "shape": shape, "verts": out.vertices,
            "reposed_verts": reposed.vertices, "joints2d": joints2d,
            "joints3d_all": out.joints,
        }

    return predict


def load_cached_proxies(proxy_dir: str, img_wh: int):
    """Load cached silhouette/joints npys: `<name>_silhouette.npy` (H, W)
    and `<name>_joints2D.npy` (17, 2) per image; returns (names, proxies)."""
    sil_files = sorted(glob.glob(os.path.join(proxy_dir, "*_silhouette.npy")))
    if not sil_files:
        raise FileNotFoundError(f"no *_silhouette.npy files in {proxy_dir}")
    names = [os.path.basename(sf)[: -len("_silhouette.npy")]
             for sf in sil_files]
    joint_files = [os.path.join(proxy_dir, f"{n}_joints2D.npy") for n in names]
    # Multithreaded native batch load (straps_tpu.data.native_io); shapes
    # come from the first file.
    from straps_tpu.data.native_io import load_npy_batch
    sil_shape = np.load(sil_files[0], mmap_mode="r").shape
    joint_shape = np.load(joint_files[0], mmap_mode="r").shape
    sils = load_npy_batch(sil_files, sil_shape)
    joints = load_npy_batch(joint_files, joint_shape)[:, :, :2]
    proxies, _ = batch_silhouettes_joints_to_proxies(
        jnp.asarray(sils), jnp.asarray(joints), img_wh)
    return names, proxies


def load_regressor_variables(cfg: PredictConfig, assets):
    model = build_regressor(assets.mean_pose_6d, assets.mean_shape,
                            in_channels=cfg.model.resnet_in_channels,
                            resnet_layers=cfg.model.resnet_layers,
                            ief_iters=cfg.model.ief_iters)
    if cfg.checkpoint is None:
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, cfg.img_wh, cfg.img_wh,
                                          cfg.model.resnet_in_channels)),
                               train=False)
    elif cfg.checkpoint.endswith(".tar"):
        variables = load_reference_checkpoint(cfg.checkpoint)
        variables = {"params": variables["params"],
                     "batch_stats": variables["batch_stats"]}
    else:
        import orbax.checkpoint as ocp
        restored = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(cfg.checkpoint))
        if "best_params" in restored:
            params = restored["best_params"]
            bs = restored["state"]["batch_stats"]
        else:
            params, bs = restored["params"], restored["batch_stats"]
        variables = {"params": params, "batch_stats": bs}
    return model, variables


def predict_3d(cfg: PredictConfig) -> Dict[str, np.ndarray]:
    """Run inference over cached proxies; save npy outputs + vis.

    Matches the output surface of `predict/predict_3D.py`: per-image verts,
    SMPL params, camera, reposed verts.
    """
    assets = load_assets(cfg.smpl_dir)
    model, variables = load_regressor_variables(cfg, assets)
    if cfg.silhouettes_from != "cached":
        raise NotImplementedError(
            "detector front-ends (pointrend/densepose) are not built yet; "
            "use silhouettes_from='cached' with precomputed proxies "
            "(BASELINE config[0] path)")
    proxy_dir = cfg.proxy_dir or cfg.input_dir
    names, proxies = load_cached_proxies(proxy_dir, cfg.img_wh)
    predict = make_predict_fn(model, variables, assets, cfg.img_wh)
    out = predict(proxies)
    out_np = {k: np.asarray(v) for k, v in out.items()}

    os.makedirs(cfg.out_dir, exist_ok=True)
    for i, name in enumerate(names):
        np.save(os.path.join(cfg.out_dir, f"{name}_verts.npy"),
                out_np["verts"][i])
        np.save(os.path.join(cfg.out_dir, f"{name}_shape.npy"),
                out_np["shape"][i])
        np.save(os.path.join(cfg.out_dir, f"{name}_pose_rotmats.npy"),
                out_np["pose_rotmats"][i])
        np.save(os.path.join(cfg.out_dir, f"{name}_cam_wp.npy"),
                out_np["cam_wp"][i])
    out_np["names"] = names
    return out_np
