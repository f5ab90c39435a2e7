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
from straps_tpu.perception.ops import roi_align
from straps_tpu.perception.pointrend import (
    CoarseMaskHead, PointHead, subdivision_inference, paste_mask,
)
from straps_tpu.perception.densepose import (
    DensePoseHead, DensePosePredictor, densepose_to_iuv,
    paste_densepose_labels,
)
from straps_tpu.perception.rpn import RPNHead, generate_proposals

# detectron2 COCO pixel normalisation (BGR mean, std 1 for the R50 models).
PIXEL_MEAN = np.asarray([103.53, 116.28, 123.675], np.float32)
PIXEL_STD = np.asarray([1.0, 1.0, 1.0], np.float32)

# The reference resizes inputs to 512 before its detectors
# (predict_3D.py:106); detectron2's DefaultPredictor then resizes the
# shortest edge to 800 (INPUT.MIN_SIZE_TEST) before the network and maps
# outputs back.  The front-end therefore runs the nets at
# DETECTOR_TEST_SIZE and returns outputs in the DEFAULT_IMAGE_SIZE frame
# (module attribute `output_size`).
DEFAULT_IMAGE_SIZE = 512
DETECTOR_TEST_SIZE = 800
# Deviations from detectron2 defaults (documented in PARITY.md): d2 keeps
# 1000 post-NMS proposals and up to 100 detections; STRAPS consumes exactly
# one largest-centred person, so smaller static sizes are used on TPU.
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
    num_classes: int = 1
    # detectron2 ROI_HEADS.SCORE_THRESH_TEST.
    score_thresh: float = 0.05
    # detectron2 ROI_BOX_HEAD.POOLER_TYPE: ROIAlignV2 (aligned) for the
    # KP/PointRend configs, legacy "ROIAlign" for DensePose
    # (`DensePose/configs/Base-DensePose-RCNN-FPN.yaml`).
    box_pooler_aligned: bool = True
    # ROI_BOX_HEAD.POOLER_SAMPLING_RATIO: the KP/PointRend configs keep the
    # detectron2 default 0 (adaptive ceil(roi/out) samples per bin);
    # DensePose pins 2 (same yaml, line 31).
    box_pooler_sampling_ratio: int = 0
    # Backbone compute dtype ('bfloat16' = MXU-rate convs; heads stay f32).
    backbone_dtype: str = None

    @nn.compact
    def __call__(self, image: jnp.ndarray):
        """image: (H, W, 3) BGR, already normalised.

        Returns (fpn_feats, det_boxes (D,4), det_scores (D,), det_valid (D,)).
        """
        img_size = image.shape[0]
        feats = ResNet50FPN(depth=self.backbone_depth,
                            compute_dtype=self.backbone_dtype,
                            name="backbone")(image[None])
        feats = [f[0] for f in feats]                     # drop batch dim
        logits, deltas = RPNHead(name="rpn_head")(feats)
        # Grids sized from the REAL feature maps: at 800² P6 is 13x13
        # (maxpool of the 25x25 P5), not 800//64=12 (`fpn_anchors`).
        anchors = fpn_anchors(img_size, FPN_STRIDES,
                              feat_sizes=[f.shape[:2] for f in feats])
        proposals, p_scores, p_valid = generate_proposals(
            logits, deltas, anchors, img_size,
            post_nms_topk=self.post_nms_topk)
        roi = pooled_box_features(feats, proposals, 7,
                                  aligned=self.box_pooler_aligned,
                                  sampling_ratio=self.box_pooler_sampling_ratio,
                                  compute_dtype=self.backbone_dtype)
        scores, box_deltas = BoxHead(num_classes=self.num_classes,
                                     name="box_head")(roi)
        det_boxes, det_scores, det_valid = box_inference(
            scores, box_deltas, proposals, p_valid, img_size,
            score_thresh=self.score_thresh,
            max_detections=self.max_detections)
        return feats, det_boxes, det_scores, det_valid


class KeypointRCNN(nn.Module):
    """Person detection + 17 COCO keypoints (reference Keypoint-RCNN-R50-FPN
    front-end, `predict/predict_joints2D.py`).  `output_size` > 0 rescales
    boxes/keypoints into that frame (detectron2's detector_postprocess when
    the predictor ran at MIN_SIZE_TEST=800 on a smaller input)."""
    post_nms_topk: int = POST_NMS_TOPK
    max_detections: int = MAX_DETECTIONS
    output_size: int = 0
    backbone_dtype: str = None
    score_thresh: float = 0.05

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        feats, boxes, scores, valid = DetectionTrunk(
            post_nms_topk=self.post_nms_topk,
            max_detections=self.max_detections,
            score_thresh=self.score_thresh,
            backbone_dtype=self.backbone_dtype, name="trunk")(image)
        # ROI_KEYPOINT_HEAD.POOLER_SAMPLING_RATIO stays at the d2 default 0
        # (adaptive), like the box pooler.
        kp_roi = pooled_box_features(feats, boxes, 14,
                                     compute_dtype=self.backbone_dtype)
        heatmaps = KeypointHead(name="keypoint_head")(kp_roi)
        out_size = self.output_size or image.shape[0]
        scale = out_size / image.shape[0]
        out_boxes = boxes * scale
        # Boxes are clipped to the image, so out_size bounds every ROI side:
        # the static decode grid covers d2's dynamic resize exactly.
        keypoints, kp_scores = keypoint_decode(heatmaps, out_boxes,
                                               grid_size=out_size)
        return {"boxes": out_boxes, "scores": scores, "valid": valid,
                "keypoints": keypoints, "keypoint_scores": kp_scores}


class PointRendRCNN(nn.Module):
    """Person detection + PointRend instance masks (reference
    PointRend-R50-FPN front-end, `predict/predict_silhouette_pointrend.py`).
    The COCO PointRend checkpoint is 80-class (person = class 0); coarse
    mask features are point-sampled p2 on a regular 14x14 box grid —
    `PointRend/point_rend/roi_heads.py:134-150` with
    ROI_MASK_HEAD.IN_FEATURES=["p2"], equivalent to single-sample ROIAlign
    on p2 only (no FPN level assignment for masks)."""
    post_nms_topk: int = POST_NMS_TOPK
    max_detections: int = MAX_DETECTIONS
    num_classes: int = 80
    output_size: int = 0
    backbone_dtype: str = None
    score_thresh: float = 0.05

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        feats, boxes, scores, valid = DetectionTrunk(
            post_nms_topk=self.post_nms_topk,
            max_detections=self.max_detections,
            num_classes=self.num_classes,
            score_thresh=self.score_thresh,
            backbone_dtype=self.backbone_dtype, name="trunk")(image)
        # detectron2's coarse features are regular-grid point_sample on p2
        # (grid_sample ZERO padding) — equal to single-sample ROIAlign in
        # mode="zeros", NOT real-ROIAlign border clamping.
        mask_roi = roi_align(feats[0], boxes, 1.0 / FPN_STRIDES[0], 14,
                             sampling_ratio=1, mode="zeros")
        coarse = CoarseMaskHead(num_classes=self.num_classes,
                                name="coarse_head")(mask_roi)
        point_head = PointHead(num_classes=self.num_classes,
                               name="point_head")
        # channel=0 (person): refine only the consumed class channel —
        # the grid resizes over all 80 COCO channels dominate the tail.
        refined = subdivision_inference(point_head, coarse, feats[0], boxes,
                                        channel=0)
        out_size = self.output_size or image.shape[0]
        scale = out_size / image.shape[0]
        out_boxes = boxes * scale
        masks = jax.vmap(
            lambda m, b: paste_mask(m[..., 0], b, out_size, out_size)
        )(refined, out_boxes)
        # Binary masks ship as bool: 32x less device->host traffic than
        # f32 (the pull is the demo path's dominant cost on a tunneled
        # backend; d2 also returns binarized pred_masks).
        return {"boxes": out_boxes, "scores": scores, "valid": valid,
                "masks": masks.astype(bool)}


class DensePoseRCNN(nn.Module):
    """Person detection + DensePose IUV (reference DensePose-R101-FPN
    front-end, `predict/predict_densepose.py`)."""
    post_nms_topk: int = POST_NMS_TOPK
    max_detections: int = MAX_DETECTIONS
    backbone_depth: int = 101
    output_size: int = 0
    backbone_dtype: str = None
    score_thresh: float = 0.05
    # Also emit the per-detection frame-size part-label maps ("part_map",
    # uint8) — the reference's pasted I_image.  Off by default: it adds
    # (R, out, out) bytes to the device->host pull (the tunnel link is the
    # demo-path bottleneck) and only the vis overlay consumes it.
    output_part_maps: bool = False

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        feats, boxes, scores, valid = DetectionTrunk(
            post_nms_topk=self.post_nms_topk,
            max_detections=self.max_detections,
            backbone_depth=self.backbone_depth,
            box_pooler_aligned=False,
            box_pooler_sampling_ratio=2,
            score_thresh=self.score_thresh,
            backbone_dtype=self.backbone_dtype, name="trunk")(image)
        # POOLER_RESOLUTION=14, legacy-ROIAlign pooler type, SAMPLING_RATIO=2
        # (`DensePose/densepose/config.py:26-27` defaults + the base yaml's
        # POOLER_TYPE/POOLER_SAMPLING_RATIO overrides); head keeps 14^2,
        # predictor deconv doubles to 28^2 and the 2x bilinear reaches
        # HEATMAP_SIZE=56.
        dp_roi = pooled_box_features(feats, boxes, 14, aligned=False,
                                     sampling_ratio=2,
                                     compute_dtype=self.backbone_dtype)
        x = DensePoseHead(name="densepose_head")(dp_roi)
        s, i, u, v = DensePosePredictor(name="densepose_predictor")(x)
        part, u_sel, v_sel = densepose_to_iuv(s, i, u, v)
        out_size = self.output_size or image.shape[0]
        scale = out_size / image.shape[0]
        out_boxes = boxes * scale
        # Reference-exact frame labels: resample the S/I logits bilinearly
        # to the int box size, argmax AFTER resampling, paste at the
        # int-truncated origin (structures.py:374-401 +
        # predict_densepose.py:95-101).  The binary person silhouette STRAPS
        # consumes is part_frame > 0.
        part_frame = jax.vmap(
            lambda sl, il, b: paste_densepose_labels(sl, il, b,
                                                     out_size, out_size)
        )(s, i, out_boxes)
        out = {"boxes": out_boxes, "scores": scores, "valid": valid,
               "masks": part_frame > 0, "part_index": part,
               "u": u_sel, "v": v_sel}
        if self.output_part_maps:
            out["part_map"] = part_frame.astype(jnp.uint8)
        return out


def normalise_image(image_rgb: np.ndarray) -> np.ndarray:
    """uint8 RGB (H, W, 3) -> normalised BGR float input (host-side)."""
    bgr = np.asarray(image_rgb, np.float32)[..., ::-1]
    return (bgr - PIXEL_MEAN) / PIXEL_STD


def normalise_image_device(image_rgb: jnp.ndarray) -> jnp.ndarray:
    """Same normalisation inside the jit: lets the batched front-end ship
    uint8 over the host->device link (4x less transfer than f32 — the link
    dominated the 800^2 demo path) and fuse the arithmetic into the first
    conv."""
    bgr = jnp.asarray(image_rgb, jnp.float32)[..., ::-1]
    return (bgr - jnp.asarray(PIXEL_MEAN)) / jnp.asarray(PIXEL_STD)
