"""SMPL shape sampling + pose conversion (reference
`augmentation/smpl_augmentation.py`)."""

from typing import Tuple

import jax
import jax.numpy as jnp

from straps_tpu.geometry.rotations import rodrigues


def uniform_sample_shape(key, batch_size: int, mean_shape: jnp.ndarray,
                         delta_betas_range) -> jnp.ndarray:
    """Uniform beta deviations around the mean (`smpl_augmentation.py:6-14`)."""
    lo, hi = delta_betas_range
    delta = jax.random.uniform(key, (batch_size, mean_shape.shape[-1]),
                               minval=lo, maxval=hi)
    return delta + mean_shape


def normal_sample_shape(key, batch_size: int, mean_shape: jnp.ndarray,
                        std_vector: jnp.ndarray) -> jnp.ndarray:
    """Gaussian beta deviations around the mean (`smpl_augmentation.py:17-24`)."""
    delta = jax.random.normal(key, (batch_size, mean_shape.shape[-1])) * std_vector
    return delta + mean_shape


def augment_smpl(key, orig_shape: jnp.ndarray, pose: jnp.ndarray,
                 global_orient: jnp.ndarray, mean_shape: jnp.ndarray,
                 params: dict) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shape resampling + axis-angle -> rotmat conversion
    (`smpl_augmentation.py:27-61`).

    Args:
      orig_shape: (B, 10) dataset betas.
      pose: (B, 69) body pose axis-angle (23 joints).
      global_orient: (B, 3) root axis-angle.
      params: dict with keys augment_shape, delta_betas_distribution,
        delta_betas_range, delta_betas_std_vector.
    Returns:
      (new_shape (B,10), pose_rotmats (B,23,3,3), glob_rotmats (B,1,3,3))
    """
    B = orig_shape.shape[0]
    if params.get("augment_shape", False):
        dist = params["delta_betas_distribution"]
        if dist == "uniform":
            new_shape = uniform_sample_shape(key, B, mean_shape,
                                             params["delta_betas_range"])
        elif dist == "normal":
            new_shape = normal_sample_shape(
                key, B, mean_shape, jnp.asarray(params["delta_betas_std_vector"]))
        else:
            raise ValueError(f"unknown distribution {dist!r}")
    else:
        new_shape = orig_shape
    pose_rotmats = rodrigues(pose.reshape(B, 23, 3))
    glob_rotmats = rodrigues(global_orient.reshape(B, 1, 3))
    return new_shape, pose_rotmats, glob_rotmats
