"""Pure-jnp geometry core: rotations, cameras, heatmaps, alignment, bboxes."""

from straps_tpu.geometry.rotations import (
    rot6d_to_rotmat,
    rotmat_to_rot6d,
    rodrigues,
    rotmat_to_axis_angle,
    rotate_translate_points,
)
from straps_tpu.geometry.camera import (
    orthographic_project,
    get_intrinsics_matrix,
    perspective_project,
    weak_perspective_to_camera_translation,
)
from straps_tpu.geometry.heatmaps import (
    joints_to_gaussian_heatmaps, convert_multiclass_to_binary_labels,
    convert_densepose_to_6part_lsp_labels,
)
from straps_tpu.geometry.alignment import (
    compute_similarity_transform,
    procrustes_align,
    scale_and_translation_transform,
)
from straps_tpu.geometry.joints import (
    undo_keypoint_normalisation,
    normalise_keypoints,
    check_joints2d_visibility,
)
from straps_tpu.geometry.bbox import (
    mask_bounding_box,
    crop_and_resize_seg_joints,
    crop_and_resize_padded,
    batch_crop_and_resize,
    pad_to_square,
)

__all__ = [
    "rot6d_to_rotmat", "rotmat_to_rot6d", "rodrigues", "rotmat_to_axis_angle",
    "rotate_translate_points", "orthographic_project", "get_intrinsics_matrix",
    "perspective_project", "weak_perspective_to_camera_translation",
    "joints_to_gaussian_heatmaps", "convert_multiclass_to_binary_labels",
    "convert_densepose_to_6part_lsp_labels", "pad_to_square",
    "compute_similarity_transform",
    "procrustes_align", "scale_and_translation_transform",
    "undo_keypoint_normalisation", "normalise_keypoints",
    "check_joints2d_visibility", "mask_bounding_box",
    "crop_and_resize_seg_joints", "crop_and_resize_padded",
    "batch_crop_and_resize",
]
