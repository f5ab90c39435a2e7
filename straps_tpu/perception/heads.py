"""ROI heads: box classification/regression + keypoint head.

Mirrors detectron2's StandardROIHeads (FastRCNNConvFCHead with 2 FCs,
FastRCNNOutputLayers) and KRCNNConvDeconvUpsampleHead (8 convs + deconv +
2x upsample -> 17 x 56 x 56 heatmaps) consumed by the reference's
Keypoint-RCNN front-end (`predict/predict_joints2D.py`).  Static shapes:
fixed proposal/detection counts with validity masks.
"""

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from straps_tpu.perception.ops import (
    decode_boxes, clip_boxes, nms_fixed, multilevel_roi_align,
)

BOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


class BoxHead(nn.Module):
    """2-FC box feature head + person-class predictor (num_classes = 1)."""
    fc_dim: int = 1024
    num_classes: int = 1

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        """roi_feats: (R, 7, 7, C) -> (scores (R, C+1), deltas (R, 4C))."""
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_dim, name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_dim, name="fc2")(x))
        scores = nn.Dense(self.num_classes + 1, name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, name="bbox_pred")(x)
        return scores, deltas


def box_inference(scores: jnp.ndarray, deltas: jnp.ndarray,
                  proposals: jnp.ndarray, proposal_valid: jnp.ndarray,
                  img_size: int, score_thresh: float = 0.05,
                  nms_thresh: float = 0.5, max_detections: int = 8
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Person-class detection post-processing (softmax -> threshold -> NMS),
    static output (max_detections)."""
    probs = jax.nn.softmax(scores, axis=-1)[:, 0]  # person class prob
    boxes = decode_boxes(deltas[:, :4], proposals, weights=BOX_REG_WEIGHTS)
    boxes = clip_boxes(boxes, img_size, img_size)
    s = jnp.where(proposal_valid & (probs > score_thresh), probs, -jnp.inf)
    keep_idx, keep_valid = nms_fixed(boxes, s, nms_thresh, max_detections)
    safe = jnp.maximum(keep_idx, 0)
    return boxes[safe], probs[safe] * keep_valid, keep_valid


class KeypointHead(nn.Module):
    """8 x conv3x3(512) + deconv 4x4 s2 + 2x bilinear -> (R, 56, 56, 17)."""
    num_keypoints: int = 17
    conv_dim: int = 512
    num_convs: int = 8

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        x = roi_feats  # (R, 14, 14, C)
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_dim, (3, 3), padding=1,
                                name=f"conv_fcn{i + 1}")(x))
        # kernel 4 stride 2 "SAME" = exact 2x upsample (torch k4/s2/p1 sizes)
        x = nn.ConvTranspose(self.num_keypoints, (4, 4), strides=(2, 2),
                             padding="SAME",
                             name="score_lowres")(x)      # (R, 28, 28, 17)
        R, H, W, K = x.shape
        x = jax.image.resize(x, (R, H * 2, W * 2, K), method="bilinear")
        return x                                          # (R, 56, 56, 17)


def keypoint_decode(heatmaps: jnp.ndarray, boxes: jnp.ndarray,
                    upsample: int = 4) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Heatmap argmax -> image-space keypoints.

    detectron2's `heatmaps_to_keypoints` resizes each (56, 56) heatmap to the
    exact ROI size with bicubic interpolation before the argmax (sub-pixel
    precision); ROI size is dynamic, so here the heatmap is upsampled by a
    STATIC `upsample` factor (bicubic, half-pixel centres) instead —
    quantisation error <= box_side / (2 * 56 * upsample), ~1px at a 500px box
    with the default 4x.

    Args:
      heatmaps: (R, S, S, K); boxes: (R, 4) xyxy.
    Returns:
      (R, K, 2) xy coords, (R, K) scores.
    """
    R, S, _, K = heatmaps.shape
    U = S * upsample
    if upsample > 1:
        maps = jax.image.resize(heatmaps, (R, U, U, K), method="cubic")
    else:
        maps = heatmaps
    flat = maps.reshape(R, U * U, K)
    idx = jnp.argmax(flat, axis=1)                       # (R, K)
    scores = jnp.max(flat, axis=1)
    py = (idx // U).astype(jnp.float32)
    px = (idx % U).astype(jnp.float32)
    w = (boxes[:, 2] - boxes[:, 0])[:, None]
    h = (boxes[:, 3] - boxes[:, 1])[:, None]
    x = boxes[:, 0:1] + (px + 0.5) * w / U
    y = boxes[:, 1:2] + (py + 0.5) * h / U
    return jnp.stack([x, y], axis=-1), scores


def pooled_box_features(fpn_feats: List[jnp.ndarray], boxes: jnp.ndarray,
                        output_size: int,
                        aligned: bool = True,
                        compute_dtype: str = None) -> jnp.ndarray:
    """ROIAlign over P2-P5 with FPN level assignment (`aligned=False` =
    the legacy ROIAlign pooler type DensePose configures).

    `compute_dtype='bfloat16'` pools in bf16 via the MXU einsum
    formulation and returns f32 for the heads — paired with the bf16
    backbone opt-in, where the features are bf16-derived anyway (the
    down-cast is lossless), this removes the detector's hottest
    remaining op (the f32 pooling gather)."""
    if compute_dtype is not None:
        dt = jnp.dtype(compute_dtype)
        out = multilevel_roi_align([f.astype(dt) for f in fpn_feats[:4]],
                                   boxes, (4, 8, 16, 32),
                                   output_size, aligned=aligned)
        return out.astype(jnp.float32)
    return multilevel_roi_align(fpn_feats[:4], boxes, (4, 8, 16, 32),
                                output_size, aligned=aligned)
