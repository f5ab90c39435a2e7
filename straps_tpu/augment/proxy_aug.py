"""Proxy-representation degradations (reference
`augmentation/proxy_rep_augmentation.py`): vertex/joint noise, body-part
removal and box occlusion — all batched, on-device, PRNG-keyed."""

from typing import Tuple

import jax
import jax.numpy as jnp
from straps_tpu import constants as C


def random_verts2d_deviation(key, vertices: jnp.ndarray,
                             delta_range=(-0.01, 0.01)) -> jnp.ndarray:
    """Uniform 2D noise on vertex xy, corrupting silhouette edges
    (`proxy_rep_augmentation.py:5-22`).

    Args:
      vertices: (B, V, 3)
    """
    lo, hi = delta_range
    B, V = vertices.shape[:2]
    noise = jax.random.uniform(key, (B, V, 2), minval=lo, maxval=hi)
    return vertices.at[:, :, :2].add(noise)


def random_joints2d_deviation(key, joints2d: jnp.ndarray,
                              delta_range=(-5.0, 5.0),
                              delta_hip_range=(-15.0, 15.0)) -> jnp.ndarray:
    """Uniform joint-location noise, hips with their own (usually larger)
    range (`proxy_rep_augmentation.py:25-49`).

    Args:
      joints2d: (B, 17, 2) COCO joints.
    """
    k1, k2 = jax.random.split(key)
    B, J = joints2d.shape[:2]
    lo, hi = delta_range
    noise = jax.random.uniform(k1, (B, J, 2), minval=lo, maxval=hi)
    hlo, hhi = delta_hip_range
    hip_noise = jax.random.uniform(k2, (B, J, 2), minval=hlo, maxval=hhi)
    is_hip = jnp.zeros((J,), bool).at[jnp.asarray(C.COCO_HIP_JOINTS)].set(True)
    return joints2d + jnp.where(is_hip[None, :, None], hip_noise, noise)


def random_remove_bodyparts(key, seg: jnp.ndarray, classes_to_remove,
                            probabilities_to_remove) -> jnp.ndarray:
    """Per-sample, per-class random part removal
    (`proxy_rep_augmentation.py:52-75`).

    Args:
      seg: (B, H, W) int/float part map.
    """
    assert len(classes_to_remove) == len(probabilities_to_remove)
    B = seg.shape[0]
    keys = jax.random.split(key, len(classes_to_remove))
    for k, cls, prob in zip(keys, classes_to_remove, probabilities_to_remove):
        remove = jax.random.uniform(k, (B,)) < prob
        hit = remove[:, None, None] & (seg == cls)
        seg = jnp.where(hit, jnp.zeros_like(seg), seg)
    return seg


def random_occlude(key, seg: jnp.ndarray, occlude_probability: float = 0.5,
                   occlude_box_dim: int = 48) -> jnp.ndarray:
    """Zero a centred-ish square box per sample with given probability
    (`proxy_rep_augmentation.py:78-101`): box centre uniform within the
    middle 30% of the image, fixed box size.

    Args:
      seg: (B, H, W)
    """
    B, H, W = seg.shape
    kc, kp = jax.random.split(key)
    # Per-axis centre ranges (rows from H, cols from W): deriving both
    # from H puts the box off-subject on non-square maps.
    lo = jnp.asarray([H / 2.0 - 0.3 * H / 2.0, W / 2.0 - 0.3 * W / 2.0])
    hi = jnp.asarray([H / 2.0 + 0.3 * H / 2.0, W / 2.0 + 0.3 * W / 2.0])
    cxy = jax.random.uniform(kc, (B, 2), minval=lo, maxval=hi)
    occlude = jax.random.uniform(kp, (B,)) < occlude_probability
    half = occlude_box_dim / 2.0
    r0 = (cxy[:, 0] - half).astype(jnp.int32)
    r1 = (cxy[:, 0] + half).astype(jnp.int32)
    c0 = (cxy[:, 1] - half).astype(jnp.int32)
    c1 = (cxy[:, 1] + half).astype(jnp.int32)
    rows = jnp.arange(H)[None, :, None]
    cols = jnp.arange(W)[None, None, :]
    in_box = ((rows >= r0[:, None, None]) & (rows < r1[:, None, None]) &
              (cols >= c0[:, None, None]) & (cols < c1[:, None, None]))
    hit = in_box & occlude[:, None, None]
    return jnp.where(hit, jnp.zeros_like(seg), seg)


def augment_proxy_representation(key, segs: jnp.ndarray, joints2d: jnp.ndarray,
                                 params: dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Orchestrator matching `proxy_rep_augmentation.py:104-123`."""
    k_rm, k_occ, k_dev = jax.random.split(key, 3)
    if params.get("remove_appendages", False):
        segs = random_remove_bodyparts(
            k_rm, segs, params["remove_appendages_classes"],
            params["remove_appendages_probabilities"])
    if params.get("occlude_seg", False):
        segs = random_occlude(k_occ, segs,
                              occlude_probability=params["occlude_probability"],
                              occlude_box_dim=params["occlude_box_dim"])
    if params.get("deviate_joints2D", False):
        joints2d = random_joints2d_deviation(
            k_dev, joints2d,
            delta_range=tuple(params["delta_j2d_dev_range"]),
            delta_hip_range=tuple(params["delta_j2d_hip_dev_range"]))
    return segs, joints2d
