"""Camera translation jitter (reference `augmentation/cam_augmentation.py`)."""

import jax
import jax.numpy as jnp


def augment_cam_t(key, mean_cam_t: jnp.ndarray, xy_std: float = 0.05,
                  delta_z_range=(-5.0, 5.0)) -> jnp.ndarray:
    """Gaussian xy jitter + uniform z jitter around the mean camera
    translation (`cam_augmentation.py:4-15`).

    Args:
      mean_cam_t: (B, 3)
    Returns:
      (B, 3) jittered camera translations.
    """
    kxy, kz = jax.random.split(key)
    B = mean_cam_t.shape[0]
    delta_xy = jax.random.normal(kxy, (B, 2)) * xy_std
    lo, hi = delta_z_range
    delta_z = jax.random.uniform(kz, (B,), minval=lo, maxval=hi)
    return jnp.concatenate([mean_cam_t[:, :2] + delta_xy,
                            (mean_cam_t[:, 2] + delta_z)[:, None]], axis=1)
