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

# The reference's pyrender scene, reproduced exactly
# (`renderers/weak_perspective_pyrender_renderer.py:50-95`): ambient light
# (0.3, 0.3, 0.3); two white point lights, intensity 1.0, at (0, -1, 1) and
# (0, 1, 1) in the GL world frame (camera pose = identity, mesh transformed
# by Rx(180deg)); MetallicRoughnessMaterial with metallicFactor=0.2,
# baseColorFactor=(0.8, 0.3, 0.3) and the pyrender default
# roughnessFactor=1.0.  pyrender's mesh shader implements the glTF 2.0
# metallic-roughness BRDF with punctual point lights (inverse-square
# falloff) and writes gamma-corrected (1/2.2) output.
LIT_AMBIENT = 0.3
LIT_LIGHT_POSITIONS = np.asarray([[0.0, -1.0, 1.0], [0.0, 1.0, 1.0]],
                                 np.float32)
LIT_LIGHT_INTENSITY = 1.0
LIT_BASE_COLOR = np.asarray([0.8, 0.3, 0.3], np.float32)
LIT_METALLIC = 0.2
LIT_ROUGHNESS = 1.0


def lit_face_colors(verts: np.ndarray, faces: np.ndarray,
                    base_color: np.ndarray = LIT_BASE_COLOR) -> np.ndarray:
    """Per-face shaded RGB under the reference's two-point-light pyrender
    scene -> (F, 3) in [0, 1], gamma-corrected.

    Implements the glTF 2.0 metallic-roughness BRDF (pyrender's shader) with
    the exact scene constants above, flat-shaded per face: geometric face
    normal, face-centroid fragment position.  `verts` are model-space; the
    reference applies Rx(180deg) before rendering
    (`weak_perspective_pyrender_renderer.py:69-70`), i.e. the GL lighting
    frame is (x, -y, -z) with the camera at the origin looking down -z.
    """
    verts = np.asarray(verts, np.float32) * np.asarray([1.0, -1.0, -1.0],
                                                       np.float32)
    tri = verts[np.asarray(faces)]                      # (F, 3, 3)
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-12
    p = tri.mean(axis=1)                                # (F, 3) centroid
    view = -p / (np.linalg.norm(p, axis=-1, keepdims=True) + 1e-12)
    # Front-face the normals toward the viewer (only front-facing faces
    # survive the depth test, so this matches the rendered winding).
    n = np.where((n * view).sum(-1, keepdims=True) < 0.0, -n, n)

    base = np.asarray(base_color, np.float32)
    # glTF BRDF inputs: dielectric F0 = 0.04, lerped to base by metallic.
    c_diff = base * (1.0 - 0.04) * (1.0 - LIT_METALLIC)
    f0 = 0.04 * (1.0 - LIT_METALLIC) + base * LIT_METALLIC
    alpha = LIT_ROUGHNESS ** 2
    n_dot_v = np.clip((n * view).sum(-1, keepdims=True), 1e-3, 1.0)

    color = np.full(tri.shape[:1] + (3,), LIT_AMBIENT, np.float32) * base
    for light_pos in LIT_LIGHT_POSITIONS:
        lvec = light_pos[None] - p
        dist = np.linalg.norm(lvec, axis=-1, keepdims=True)
        ldir = lvec / (dist + 1e-12)
        # glTF punctual point light: inverse-square attenuation.
        att = LIT_LIGHT_INTENSITY / np.maximum(dist ** 2, 1e-12)
        n_dot_l = np.clip((n * ldir).sum(-1, keepdims=True), 1e-3, 1.0)
        half = ldir + view
        half /= np.linalg.norm(half, axis=-1, keepdims=True) + 1e-12
        n_dot_h = np.clip((n * half).sum(-1, keepdims=True), 0.0, 1.0)
        v_dot_h = np.clip((view * half).sum(-1, keepdims=True), 0.0, 1.0)
        fresnel = f0 + (1.0 - f0) * (1.0 - v_dot_h) ** 5
        ggx_d = alpha ** 2 / (np.pi * (n_dot_h ** 2 * (alpha ** 2 - 1.0)
                                       + 1.0) ** 2)
        smith_vis = 0.5 / (
            n_dot_l * np.sqrt(n_dot_v ** 2 * (1.0 - alpha ** 2) + alpha ** 2)
            + n_dot_v * np.sqrt(n_dot_l ** 2 * (1.0 - alpha ** 2)
                                + alpha ** 2))
        diffuse = (1.0 - fresnel) * c_diff / np.pi
        specular = fresnel * ggx_d * smith_vis
        color += att * n_dot_l * (diffuse + specular)
    return np.clip(color, 0.0, 1.0) ** (1.0 / 2.2)


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
                    img_wh: int = 512, image: Optional[np.ndarray] = None,
                    rotate_x180: bool = False,
                    style: str = "lit") -> np.ndarray:
    """Shaded body render from predicted verts + weak-perspective camera,
    optionally composited over the input image (the reference's rend_vis
    output, `predict/predict_3D.py:168-176`).

    `rotate_x180` applies a 180-degree rotation about the x axis before
    rendering — the reference's reposed T-pose view passes angle=180,
    axis=[1,0,0] (`predict_3D.py:172-176`).

    `style="lit"` (default) shades with the reference pyrender scene's
    exact two-point-light material model via `lit_face_colors`;
    `style="parts"` keeps the body-part-coloured debug view."""
    if rotate_x180:
        verts = np.asarray(verts) * np.asarray([1.0, -1.0, -1.0], np.float32)
    cam_t = np.asarray(weak_perspective_to_camera_translation(
        jnp.asarray(cam_wp)[None], 5000.0 * img_wh / 512.0, img_wh))[0]
    K = jnp.asarray(get_intrinsics_matrix(img_wh, img_wh,
                                          5000.0 * img_wh / 512.0))
    if style == "lit":
        from straps_tpu.render.raster import (
            prepare_face_planes, project_to_screen, rasterize_xla,
        )
        screen, z = project_to_screen(jnp.asarray(verts)[None],
                                      jnp.asarray(cam_t)[None], K)
        planes = prepare_face_planes(screen, z, assets.faces).planes
        fid, _ = rasterize_xla(planes, img_wh, img_wh)
        fid_np = np.asarray(fid[0])
        fg = fid_np >= 0
        face_rgb = lit_face_colors(verts, np.asarray(assets.faces))
        color = np.where(fg[..., None],
                         face_rgb[np.maximum(fid_np, 0)], 0.0)
    elif style == "parts":
        parts, depth = render_part_seg(
            jnp.asarray(verts)[None], jnp.asarray(cam_t)[None], K,
            assets.faces, assets.face_parts, img_wh, backend="xla")
        parts_np = np.asarray(parts[0])
        shade = shade_depth(np.asarray(depth[0]))
        color = PART_COLORS[parts_np] * shade[..., None]
        fg = parts_np > 0
    else:
        raise ValueError(f"unknown style {style!r}")
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
    """Silhouette + summed heatmaps image — fallback proxy visualisation for
    cached-proxy runs, where the detector vis images below cannot be built
    (no source image)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    sil = np.asarray(proxy[..., 0])
    hm = np.asarray(proxy[..., 1:]).sum(axis=-1)
    img = np.clip(sil + hm, 0, 1)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    plt.imsave(out_path, img, cmap="gray")


def keypoints_vis(image_rgb: np.ndarray, keypoints: np.ndarray) -> np.ndarray:
    """Detector-frame keypoint annotation: green filled circle + red joint
    index per keypoint (`predict/predict_joints2D.py:53-59`)."""
    import cv2
    img = np.ascontiguousarray(np.asarray(image_rgb, np.uint8).copy())
    kp = np.asarray(keypoints)
    for j in range(kp.shape[0]):
        x, y = int(round(float(kp[j, 0]))), int(round(float(kp[j, 1])))
        cv2.circle(img, (x, y), 5, (0, 255, 0), -1)
        cv2.putText(img, str(j), (x, y), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                    (255, 0, 0), lineType=2)  # red in RGB frames
    return img


def silhouette_overlay_vis(image_rgb: np.ndarray,
                           mask: np.ndarray) -> np.ndarray:
    """Half-opacity white-mask overlay
    (`predict/predict_silhouette_pointrend.py:53-57`)."""
    import cv2
    img = np.asarray(image_rgb, np.uint8)
    m3 = np.tile((np.asarray(mask) > 0.5).astype(np.uint8)[:, :, None] * 255,
                 (1, 1, 3))
    return cv2.addWeighted(img, 1.0, m3, 0.5, 0)


def apply_colormap(image: np.ndarray, vmin=None, vmax=None,
                   cmap: str = "viridis") -> np.ndarray:
    """Matplotlib colormap applied to a scalar image -> uint8 RGBA
    (`predict/predict_densepose.py:18-45` semantics, minus its random
    discrete-cmap branch which STRAPS never uses)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    img = np.asarray(image, np.float64)
    imin = float(vmin) if vmin is not None else img.min()
    imax = float(vmax) if vmax is not None else img.max()
    img = np.clip(img, imin, imax)
    img = (img - imin) / max(imax - imin, 1e-12)
    return plt.get_cmap(cmap)(img, bytes=True)


def densepose_overlay_vis(image_rgb: np.ndarray,
                          i_image: np.ndarray) -> np.ndarray:
    """DensePose I-channel colormap blended over the image
    (`predict/predict_densepose.py:105-115`: viridis on [0, 24], black at
    background, 0.6/0.4 blend)."""
    import cv2
    vis_i = apply_colormap(i_image, vmin=0, vmax=24)[:, :, :3]
    vis_i[np.asarray(i_image) == 0, :] = 0
    return cv2.addWeighted(np.asarray(image_rgb, np.uint8), 0.6,
                           vis_i.astype(np.uint8), 0.4, 0)


def verts_over_image_vis(verts2d: np.ndarray, image_rgb: np.ndarray,
                         out_path: str):
    """Projected 2D vertices scattered OVER the cropped input image — the
    reference's verts_vis content (`predict/predict_3D.py:159-167`)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    v = np.asarray(verts2d)
    fig = plt.figure()
    plt.imshow(np.asarray(image_rgb, np.uint8))
    plt.scatter(v[:, 0], v[:, 1], s=0.3)
    plt.gca().set_axis_off()
    plt.subplots_adjust(top=1, bottom=0, right=1, left=0, hspace=0, wspace=0)
    plt.margins(0, 0)
    plt.gca().xaxis.set_major_locator(plt.NullLocator())
    plt.gca().yaxis.set_major_locator(plt.NullLocator())
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path)
    plt.close(fig)


def paste_roi_map(roi_map: np.ndarray, box_xyxy: np.ndarray, out_h: int,
                  out_w: int) -> np.ndarray:
    """Nearest-resize a per-ROI label map into its box in a zeroed
    (out_h, out_w) canvas — the I-channel paste of
    `predict/predict_densepose.py:95-101`."""
    import cv2
    x1, y1, x2, y2 = [int(round(float(c))) for c in np.asarray(box_xyxy)]
    x1, y1 = max(x1, 0), max(y1, 0)
    x2, y2 = min(x2, out_w), min(y2, out_h)
    canvas = np.zeros((out_h, out_w), np.asarray(roi_map).dtype)
    if x2 > x1 and y2 > y1:
        canvas[y1:y2, x1:x2] = cv2.resize(
            np.asarray(roi_map), (x2 - x1, y2 - y1),
            interpolation=cv2.INTER_NEAREST)
    return canvas
