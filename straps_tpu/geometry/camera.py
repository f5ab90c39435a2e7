"""Camera models: weak-perspective and full perspective projection.

Pure jnp re-design of `utils/cam_utils.py` from the reference; everything is
batched and shape-static so it fuses into the surrounding jitted programs.
"""

import jax.numpy as jnp
import numpy as np


def orthographic_project(points3d: jnp.ndarray, cam_params: jnp.ndarray) -> jnp.ndarray:
    """Scaled orthographic (weak-perspective) projection.

    `u = s * (x + tx), v = s * (y + ty)` mapping SMPL coords to [-1, 1] image
    coords — same convention as `utils/cam_utils.py:5-26`.

    Args:
      points3d: (B, N, 3)
      cam_params: (B, 3) of [s, tx, ty]
    Returns:
      (B, N, 2) projected points in [-1, 1] space.
    """
    s = cam_params[:, 0:1]
    t = cam_params[:, None, 1:3]
    return s[..., None] * (points3d[..., :2] + t)


def get_intrinsics_matrix(img_width: int, img_height: int,
                          focal_length: float) -> np.ndarray:
    """Pinhole intrinsics with principal point at the image centre
    (`utils/cam_utils.py:29-37`)."""
    return np.array(
        [[focal_length, 0.0, img_width / 2.0],
         [0.0, focal_length, img_height / 2.0],
         [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )


def perspective_project(points: jnp.ndarray, rotation: jnp.ndarray,
                        translation: jnp.ndarray,
                        cam_K: jnp.ndarray) -> jnp.ndarray:
    """Perspective projection of 3D points to pixel coordinates.

    Mirrors `utils/cam_utils.py:40-71`.

    Args:
      points: (B, N, 3)
      rotation: (B, 3, 3) or (3, 3) camera rotation
      translation: (B, 3) camera translation
      cam_K: (B, 3, 3) or (3, 3) intrinsics
    Returns:
      (B, N, 2) pixel coordinates.
    """
    if rotation.ndim == 2:
        points = jnp.einsum("ij,bkj->bki", rotation, points, precision="highest")
    else:
        points = jnp.einsum("bij,bkj->bki", rotation, points, precision="highest")
    points = points + translation[:, None, :]
    projected = points / points[..., 2:3]
    if cam_K.ndim == 2:
        projected = jnp.einsum("ij,bkj->bki", cam_K, projected, precision="highest")
    else:
        projected = jnp.einsum("bij,bkj->bki", cam_K, projected, precision="highest")
    return projected[..., :2]


def weak_perspective_to_camera_translation(cam_wp: jnp.ndarray,
                                           focal_length: float,
                                           resolution: int) -> jnp.ndarray:
    """[s, tx, ty] -> full-perspective camera translation.

    `t = [tx, ty, 2f / (res * s)]` (`utils/cam_utils.py:74-87`), batched.

    Args:
      cam_wp: (..., 3)
    Returns:
      (..., 3)
    """
    tz = 2.0 * focal_length / (resolution * cam_wp[..., 0] + 1e-9)
    return jnp.stack([cam_wp[..., 1], cam_wp[..., 2], tz], axis=-1)
