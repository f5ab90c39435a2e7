"""Generalized R-CNN compositions: Keypoint-RCNN, PointRend-RCNN,
DensePose-RCNN — the JAX rebuild of the reference's three detectron2
predictors (`predict/predict_3D.py:35-64`).

Everything is static-shape and jittable end to end: fixed image size, fixed
proposal/detection counts with validity masks, fixed subdivision trip
counts.  Single image per call (the reference also predicts one image at a
time); vmap for batches.
"""

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from straps_tpu.perception.anchors import fpn_anchors
from straps_tpu.perception.fpn import ResNet50FPN, FPN_STRIDES
from straps_tpu.perception.heads import (
    BoxHead, KeypointHead, box_inference, keypoint_decode,
    pooled_box_features,
)
from straps_tpu.perception.pointrend import (
    CoarseMaskHead, PointHead, subdivision_inference, paste_mask,
)
from straps_tpu.perception.densepose import (
    DensePoseHead, DensePosePredictor, densepose_to_iuv,
)
from straps_tpu.perception.rpn import RPNHead, generate_proposals

# detectron2 COCO pixel normalisation (BGR mean, std 1 for the R50 models).
PIXEL_MEAN = np.asarray([103.53, 116.28, 123.675], np.float32)
PIXEL_STD = np.asarray([1.0, 1.0, 1.0], np.float32)

# The reference resizes inputs to 512 before its detectors (predict_3D.py:106).
DEFAULT_IMAGE_SIZE = 512
MAX_DETECTIONS = 8
POST_NMS_TOPK = 512


class DetectionTrunk(nn.Module):
    """Backbone + RPN + box head — shared by all three models.

    The (square) image size is static from the input shape; proposal and
    detection counts are module attributes.
    """
    post_nms_topk: int = POST_NMS_TOPK
    max_detections: int = MAX_DETECTIONS
    backbone_depth: int = 50

    @nn.compact
    def __call__(self, image: jnp.ndarray):
        """image: (H, W, 3) BGR, already normalised.

        Returns (fpn_feats, det_boxes (D,4), det_scores (D,), det_valid (D,)).
        """
        img_size = image.shape[0]
        feats = ResNet50FPN(depth=self.backbone_depth,
                            name="backbone")(image[None])
        feats = [f[0] for f in feats]                     # drop batch dim
        logits, deltas = RPNHead(name="rpn_head")(feats)
        anchors = fpn_anchors(img_size, FPN_STRIDES)
        proposals, p_scores, p_valid = generate_proposals(
            logits, deltas, anchors, img_size,
            post_nms_topk=self.post_nms_topk)
        roi = pooled_box_features(feats, proposals, 7)
        scores, box_deltas = BoxHead(name="box_head")(roi)
        det_boxes, det_scores, det_valid = box_inference(
            scores, box_deltas, proposals, p_valid, img_size,
            max_detections=self.max_detections)
        return feats, det_boxes, det_scores, det_valid


class KeypointRCNN(nn.Module):
    post_nms_topk: int = POST_NMS_TOPK
    max_detections: int = MAX_DETECTIONS
    """Person detection + 17 COCO keypoints (reference Keypoint-RCNN-R50-FPN
    front-end, `predict/predict_joints2D.py`)."""

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        feats, boxes, scores, valid = DetectionTrunk(
            post_nms_topk=self.post_nms_topk,
            max_detections=self.max_detections, name="trunk")(image)
        kp_roi = pooled_box_features(feats, boxes, 14)
        heatmaps = KeypointHead(name="keypoint_head")(kp_roi)
        keypoints, kp_scores = keypoint_decode(heatmaps, boxes)
        return {"boxes": boxes, "scores": scores, "valid": valid,
                "keypoints": keypoints, "keypoint_scores": kp_scores}


class PointRendRCNN(nn.Module):
    post_nms_topk: int = POST_NMS_TOPK
    max_detections: int = MAX_DETECTIONS
    """Person detection + PointRend instance masks (reference
    PointRend-R50-FPN front-end, `predict/predict_silhouette_pointrend.py`)."""

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        feats, boxes, scores, valid = DetectionTrunk(
            post_nms_topk=self.post_nms_topk,
            max_detections=self.max_detections, name="trunk")(image)
        mask_roi = pooled_box_features(feats, boxes, 14)
        coarse = CoarseMaskHead(name="coarse_head")(mask_roi)
        point_head = PointHead(name="point_head")
        refined = subdivision_inference(point_head, coarse, feats[0], boxes)
        img_size = image.shape[0]
        masks = jax.vmap(
            lambda m, b: paste_mask(m[..., 0], b, img_size, img_size)
        )(refined, boxes)
        return {"boxes": boxes, "scores": scores, "valid": valid,
                "masks": masks}


class DensePoseRCNN(nn.Module):
    """Person detection + DensePose IUV (reference DensePose-R101-FPN
    front-end, `predict/predict_densepose.py`)."""
    post_nms_topk: int = POST_NMS_TOPK
    max_detections: int = MAX_DETECTIONS
    backbone_depth: int = 101

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        feats, boxes, scores, valid = DetectionTrunk(
            post_nms_topk=self.post_nms_topk,
            max_detections=self.max_detections,
            backbone_depth=self.backbone_depth, name="trunk")(image)
        dp_roi = pooled_box_features(feats, boxes, 28)
        x = DensePoseHead(name="densepose_head")(dp_roi)
        s, i, u, v = DensePosePredictor(name="densepose_predictor")(x)
        part, u_sel, v_sel = densepose_to_iuv(s, i, u, v)
        # Binary person masks by pasting part>0 into the image frame.
        img_size = image.shape[0]
        masks = jax.vmap(
            lambda m, b: paste_mask(m, b, img_size, img_size)
        )((part > 0).astype(jnp.float32) * 12.0 - 6.0, boxes)
        return {"boxes": boxes, "scores": scores, "valid": valid,
                "masks": masks, "part_index": part, "u": u_sel, "v": v_sel}


def normalise_image(image_rgb: np.ndarray) -> np.ndarray:
    """uint8 RGB (H, W, 3) -> normalised BGR float input."""
    bgr = np.asarray(image_rgb, np.float32)[..., ::-1]
    return (bgr - PIXEL_MEAN) / PIXEL_STD
