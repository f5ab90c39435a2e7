"""Synthetic-training augmentations as pure functions of PRNG keys.

Re-design of the reference `augmentation/` package
(`smpl_augmentation.py`, `cam_augmentation.py`, `proxy_rep_augmentation.py`):
identical sampling distributions, but every function takes an explicit
`jax.random` key and is fully batched/jittable, so the whole augmentation
stage fuses into the on-device training step (the reference mixes global
`np.random` and `torch.rand` state and mutates tensors in place).
"""

from straps_tpu.augment.smpl_aug import (
    uniform_sample_shape, normal_sample_shape, augment_smpl,
)
from straps_tpu.augment.cam_aug import augment_cam_t
from straps_tpu.augment.proxy_aug import (
    random_verts2d_deviation, random_joints2d_deviation,
    random_remove_bodyparts, random_occlude, augment_proxy_representation,
)

__all__ = [
    "uniform_sample_shape", "normal_sample_shape", "augment_smpl",
    "augment_cam_t", "random_verts2d_deviation", "random_joints2d_deviation",
    "random_remove_bodyparts", "random_occlude",
    "augment_proxy_representation",
]
