"""Proxy-representation construction for inference.

Mirrors `predict/predict_3D.py:67-76` + the crop of `:116-121`: silhouette +
17 COCO joint heatmaps stacked into an 18-channel input, after cropping to
the silhouette bbox (padded square, `utils/image_utils.py:108-163`).

Detector-based silhouette/joint extraction (Keypoint-RCNN / PointRend /
DensePose, reference `predict/predict_3D.py:35-64`) is a separate front-end;
this module consumes their outputs (or cached ones) — the JAX detector stack
is tracked as SURVEY.md §7 step 8.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from straps_tpu.geometry import crop_and_resize_padded, joints_to_gaussian_heatmaps


def silhouette_joints_to_proxy(silhouette: jnp.ndarray, joints2d: jnp.ndarray,
                               img_wh: int,
                               bbox_scale_factor: float = 1.2,
                               heatmap_mode: str = "clean"
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-sample: full-image silhouette + joints -> (H, W, 18) proxy.

    Returns (proxy, cropped joints2d).
    """
    sil_c, j_c = crop_and_resize_padded(silhouette, joints2d, img_wh,
                                        scale_factor=bbox_scale_factor)
    sil_c = (sil_c > 0).astype(jnp.float32)
    hm = joints_to_gaussian_heatmaps(j_c[None], img_wh,
                                     mode=heatmap_mode)[0]   # (17, H, W)
    proxy = jnp.concatenate([sil_c[..., None],
                             jnp.transpose(hm, (1, 2, 0))], axis=-1)
    return proxy, j_c


def batch_silhouettes_joints_to_proxies(silhouettes: jnp.ndarray,
                                        joints2d: jnp.ndarray, img_wh: int,
                                        bbox_scale_factor: float = 1.2,
                                        heatmap_mode: str = "clean"
                                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, H0, W0) silhouettes + (B, 17, 2) joints -> (B, H, W, 18) proxies."""
    return jax.vmap(
        lambda s, j: silhouette_joints_to_proxy(s, j, img_wh,
                                                bbox_scale_factor,
                                                heatmap_mode)
    )(silhouettes, joints2d)


def densepose_iuv_to_silhouette(i_channel: np.ndarray) -> np.ndarray:
    """DensePose I-channel -> binary silhouette
    (`predict/predict_3D.py:114` + `utils/label_conversions.py:39-46`)."""
    return (np.asarray(i_channel) != 0).astype(np.float32)
