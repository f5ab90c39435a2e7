"""JAX perception front-end: Keypoint-RCNN, PointRend, DensePose.

TPU-native rebuild of the reference's detectron2 detector stack
(SURVEY.md §7 step 8).
"""

from straps_tpu.perception.rcnn import (
    KeypointRCNN, PointRendRCNN, DensePoseRCNN, DetectionTrunk,
    normalise_image, DEFAULT_IMAGE_SIZE, DETECTOR_TEST_SIZE,
)
from straps_tpu.perception.frontend import (
    get_largest_centred_box_index, get_largest_centred_mask_index,
    predict_joints2d, predict_silhouette, make_apply_fn,
)
from straps_tpu.perception.convert_d2 import convert_d2_state, load_d2_pkl
from straps_tpu.perception.densepose_structures import (
    DensePoseDataRelative, DensePoseTransformData, load_transform_data,
    rle_decode, rle_encode,
)

__all__ = [
    "KeypointRCNN", "PointRendRCNN", "DensePoseRCNN", "DetectionTrunk",
    "normalise_image", "DEFAULT_IMAGE_SIZE", "DETECTOR_TEST_SIZE",
    "get_largest_centred_box_index", "get_largest_centred_mask_index",
    "predict_joints2d", "predict_silhouette", "make_apply_fn",
    "convert_d2_state", "load_d2_pkl",
    "DensePoseDataRelative", "DensePoseTransformData", "load_transform_data",
    "rle_decode", "rle_encode",
]
