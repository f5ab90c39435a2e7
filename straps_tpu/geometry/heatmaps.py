"""2D joint -> Gaussian heatmap conversion, fully vectorised.

The reference builds heatmaps with a per-sample, per-joint Python loop that
pastes a truncated Gaussian window (`utils/label_conversions.py:58-127`).
Here the whole (B, J, H, W) tensor is one broadcasted expression, so it fuses
into the jitted training step and never touches the host.
"""

import jax.numpy as jnp
import numpy as np

from straps_tpu import constants as C


def convert_multiclass_to_binary_labels(seg):
    """Part segmentation -> binary mask (`utils/label_conversions.py:39-55`)."""
    return (jnp.asarray(seg) != 0).astype(jnp.float32)


def convert_densepose_to_6part_lsp_labels(densepose_seg):
    """DensePose 24-part labels -> LSP 6-part labels
    (`utils/label_conversions.py:8-36`), as one LUT gather."""
    lut = np.asarray(C.DENSEPOSE_TO_6PART, np.int32)
    return jnp.asarray(lut)[jnp.asarray(densepose_seg, jnp.int32)]


def joints_to_gaussian_heatmaps(joints2d: jnp.ndarray, img_wh: int,
                                std: float = 4.0) -> jnp.ndarray:
    """Batch of 2D joints -> per-joint Gaussian heatmaps.

    Matches the reference convention (`utils/label_conversions.py:90-127`):
    joints are truncated to ints, the Gaussian has the given std and is
    truncated at 2*std from the joint centre, and joints whose (rounded)
    centre lies further than 2*std outside the image produce empty maps.

    Args:
      joints2d: (B, J, 2) pixel-space joint locations (x, y).
      img_wh: output heatmap side length.
      std: Gaussian standard deviation in pixels.
    Returns:
      (B, J, img_wh, img_wh) float32 heatmaps.
    """
    size = 2.0 * std
    centres = joints2d.astype(jnp.int32).astype(jnp.float32)  # truncation, like .int()
    xs = jnp.arange(img_wh, dtype=jnp.float32)
    dx = xs[None, None, :] - centres[..., 0:1]  # (B, J, W)
    dy = xs[None, None, :] - centres[..., 1:2]  # (B, J, H)
    gx = jnp.exp(-(dx * dx) / (2.0 * std * std)) * (jnp.abs(dx) < size)
    gy = jnp.exp(-(dy * dy) / (2.0 * std * std)) * (jnp.abs(dy) < size)
    # In-bounds gate: reference skips joints with any coord <= -size or
    # >= img_wh - 1 + size.
    inb = jnp.all((centres > -size) & (centres < img_wh - 1 + size), axis=-1)
    heatmaps = gy[:, :, :, None] * gx[:, :, None, :]
    return heatmaps * inb[:, :, None, None].astype(jnp.float32)
