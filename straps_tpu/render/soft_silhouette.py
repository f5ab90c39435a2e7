"""Differentiable soft silhouette (vertex-splat approximation).

The reference's loss config lists a 'silhouette' task but its criterion
never constructs it and the NMR renderer runs under no_grad — silhouette
supervision is effectively unusable there (`losses/multi_task_loss.py:112`,
`run_train.py:52-57`).  Here we make it real and TPU-friendly: project the
mesh vertices and splat each as a Gaussian onto a coarse grid, combining
with a smooth-max — a differentiable coverage field in the spirit of soft
rasterisation, at O(V * H * W) broadcast cost with no data-dependent
control flow.

Intended use: low-resolution (e.g. 64x64) silhouette loss against the
(downsampled) target silhouette, added to the multi-task loss via the
'silhouette' task.
"""

from typing import Optional

import jax.numpy as jnp

from straps_tpu.geometry.camera import orthographic_project
from straps_tpu.geometry.joints import undo_keypoint_normalisation


def soft_silhouette(verts2d: jnp.ndarray, img_wh: int, sigma: float = 0.8,
                    sharpness: float = 2.0) -> jnp.ndarray:
    """Splat projected vertices to a soft coverage field.

    Args:
      verts2d: (B, V, 2) pixel-space vertex locations (differentiable).
      img_wh: output grid side.
      sigma: splat radius in pixels.
      sharpness: soft-max temperature (higher = closer to a hard union).
    Returns:
      (B, img_wh, img_wh) coverage in (0, 1).
    """
    xs = jnp.arange(img_wh, dtype=jnp.float32) + 0.5
    # Separable Gaussian: (B, V, W) x / (B, V, H) y.
    dx = xs[None, None, :] - verts2d[..., 0:1]
    dy = xs[None, None, :] - verts2d[..., 1:2]
    gx = jnp.exp(-(dx * dx) / (2.0 * sigma * sigma))
    gy = jnp.exp(-(dy * dy) / (2.0 * sigma * sigma))
    # Union of splats: accumulate sum_v g_v as one (B, H, W) contraction
    # (an MXU matmul over the vertex axis — materialising per-vertex maps
    # would be (B, H, W, V) and blow memory), then squash through a
    # saturating exponential so overlapping splats don't overshoot.
    acc = jnp.einsum("bvh,bvw->bhw", gy, gx)     # sum of splats
    return 1.0 - jnp.exp(-sharpness * acc / (2.0 * jnp.pi * sigma * sigma))


def soft_silhouette_from_wp(verts: jnp.ndarray, cam_wp: jnp.ndarray,
                            img_wh: int, sigma: float = 0.8,
                            sharpness: float = 2.0) -> jnp.ndarray:
    """Soft silhouette from 3D verts + weak-perspective camera (the
    differentiable path from the predicted mesh)."""
    v2d_norm = orthographic_project(verts, cam_wp)
    v2d = undo_keypoint_normalisation(v2d_norm, img_wh)
    return soft_silhouette(v2d, img_wh, sigma=sigma, sharpness=sharpness)
