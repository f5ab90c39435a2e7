"""CPU visualisation utilities.

Replaces the reference's pyrender/OpenGL visualiser
(`renderers/weak_perspective_pyrender_renderer.py`) without a GL stack:
the rasteriser's depth output + screen-space normals give a simple shaded
render, composited over the input image; plus the matplotlib scatter plots
of `predict/predict_3D.py:157-167` and proxy visualisations.
"""

import os
from typing import Optional

import numpy as np

import jax.numpy as jnp

from straps_tpu.geometry import (
    get_intrinsics_matrix, weak_perspective_to_camera_translation,
)
from straps_tpu.render import render_part_seg

# Part colours (bg + 6 parts), RGB in [0,1].
PART_COLORS = np.asarray([
    [0.0, 0.0, 0.0], [0.9, 0.3, 0.3], [0.3, 0.5, 0.9], [0.9, 0.8, 0.3],
    [0.4, 0.8, 0.4], [0.7, 0.4, 0.8], [0.8, 0.6, 0.45],
], np.float32)


def shade_depth(depth: np.ndarray, background: float = 1e30) -> np.ndarray:
    """Screen-space-normal lambertian shading of a depth map -> (H, W) in
    [0, 1]. Cheap stand-in for the pyrender point lights."""
    d = np.asarray(depth, np.float32)
    fg = d < background
    dzdx = np.gradient(np.where(fg, d, np.nan), axis=1)
    dzdy = np.gradient(np.where(fg, d, np.nan), axis=0)
    dzdx = np.nan_to_num(dzdx)
    dzdy = np.nan_to_num(dzdy)
    n = np.stack([-dzdx, -dzdy, np.ones_like(d) * 0.02], axis=-1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-9
    light = np.asarray([0.3, -0.5, 0.8])
    light = light / np.linalg.norm(light)
    shade = np.clip(n @ light, 0.0, 1.0) * 0.8 + 0.2
    return np.where(fg, shade, 0.0)


def render_body_vis(verts: np.ndarray, cam_wp: np.ndarray, assets,
                    img_wh: int = 512, image: Optional[np.ndarray] = None
                    ) -> np.ndarray:
    """Shaded body render from predicted verts + weak-perspective camera,
    optionally composited over the input image (the reference's rend_vis
    output, `predict/predict_3D.py:168-176`)."""
    cam_t = np.asarray(weak_perspective_to_camera_translation(
        jnp.asarray(cam_wp)[None], 5000.0 * img_wh / 512.0, img_wh))[0]
    K = jnp.asarray(get_intrinsics_matrix(img_wh, img_wh,
                                          5000.0 * img_wh / 512.0))
    parts, depth = render_part_seg(
        jnp.asarray(verts)[None], jnp.asarray(cam_t)[None], K, assets.faces,
        assets.face_parts, img_wh, backend="xla")
    parts_np = np.asarray(parts[0])
    shade = shade_depth(np.asarray(depth[0]))
    color = PART_COLORS[parts_np] * shade[..., None]
    fg = parts_np > 0
    if image is not None:
        # Mesh-overlay compositing: the rendered body REPLACES the input
        # pixels where the depth buffer is valid, like the reference
        # (`weak_perspective_pyrender_renderer.py:104-118`:
        # rend_img * valid_mask + (1 - valid_mask) * img).
        base = np.asarray(image, np.float32)
        if base.max() > 1.5:
            base = base / 255.0
        if base.ndim == 2:
            base = np.repeat(base[..., None], 3, axis=-1)
        if base.shape[:2] != (img_wh, img_wh):
            import cv2
            base = cv2.resize(base, (img_wh, img_wh),
                              interpolation=cv2.INTER_LINEAR)
        out = np.where(fg[..., None], color, base)
    else:
        out = np.where(fg[..., None], color, 1.0)
    return (np.clip(out, 0, 1) * 255).astype(np.uint8)


def scatter_vis(verts: np.ndarray, out_path: str):
    """3D scatter of the predicted mesh (reference verts_vis,
    `predict/predict_3D.py:159-167`)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=(4, 4))
    ax = fig.add_subplot(111, projection="3d")
    v = np.asarray(verts)
    ax.scatter(v[:, 0], v[:, 1], v[:, 2], s=0.05)
    ax.view_init(elev=-90, azim=-90)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=100)
    plt.close(fig)


def proxy_vis(proxy: np.ndarray, out_path: str):
    """Silhouette + summed heatmaps image (reference proxy_vis,
    `predict/predict_3D.py:178-183`)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    sil = np.asarray(proxy[..., 0])
    hm = np.asarray(proxy[..., 1:]).sum(axis=-1)
    img = np.clip(sil + hm, 0, 1)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    plt.imsave(out_path, img, cmap="gray")
