"""2D keypoint helpers: normalisation and visibility.

jnp re-design of `utils/joints2d_utils.py`.
"""

import jax.numpy as jnp


def undo_keypoint_normalisation(normalised_keypoints: jnp.ndarray,
                                img_wh: int) -> jnp.ndarray:
    """[-1, 1] keypoint space -> pixel space (`utils/joints2d_utils.py:5-10`)."""
    return (normalised_keypoints + 1.0) * (img_wh / 2.0)


def normalise_keypoints(keypoints: jnp.ndarray, img_wh: int) -> jnp.ndarray:
    """Pixel space -> [-1, 1] keypoint space (inverse of the above; the
    reference inlines this in `losses/multi_task_loss.py:93`)."""
    return (2.0 * keypoints) / img_wh - 1.0


def check_joints2d_visibility(joints2d: jnp.ndarray, img_wh: int) -> jnp.ndarray:
    """Per-joint visibility = both coordinates within [0, img_wh].

    Matches `utils/joints2d_utils.py:23-32` (bounds are inclusive at 0 and
    img_wh).

    Args:
      joints2d: (B, J, 2)
    Returns:
      (B, J) bool visibility mask.
    """
    inside = (joints2d >= 0) & (joints2d <= img_wh)
    return jnp.all(inside, axis=-1)
