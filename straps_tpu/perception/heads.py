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


def _cubic_kernel(t: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    """Keys cubic convolution kernel with a=-0.75 (torch bicubic)."""
    at = jnp.abs(t)
    near = ((a + 2.0) * at - (a + 3.0)) * at * at + 1.0
    far = a * (((at - 5.0) * at + 8.0) * at - 4.0)
    return jnp.where(at <= 1.0, near, jnp.where(at < 2.0, far, 0.0))


def _bicubic_resize_weights(src_len: int, out_len: int,
                            target_len: jnp.ndarray) -> jnp.ndarray:
    """(out_len, src_len) weight matrix of torch
    `F.interpolate(mode="bicubic", align_corners=False)` resizing a
    `src_len` axis to `target_len` samples (a traced scalar <= the static
    `out_len`); rows o >= target_len are zeroed.  Source indices outside
    [0, src_len) replicate the edge texel (torch's bounded accessor), so
    each valid row's 4 taps still sum to 1."""
    o = jnp.arange(out_len, dtype=jnp.float32)
    sx = (o + 0.5) * (src_len / target_len) - 0.5
    fs = jnp.floor(sx)
    frac = sx - fs
    W = jnp.zeros((out_len, src_len), jnp.float32)
    for m in (-1, 0, 1, 2):
        idx = jnp.clip(fs + m, 0, src_len - 1).astype(jnp.int32)
        W = W + _cubic_kernel(frac - m)[:, None] * jax.nn.one_hot(
            idx, src_len, dtype=jnp.float32)
    return W * (o < target_len)[:, None]


def keypoint_decode(heatmaps: jnp.ndarray, boxes: jnp.ndarray,
                    grid_size: int = 512, row_chunk: int = 64
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Heatmap argmax -> image-space keypoints, with detectron2's EXACT
    `heatmaps_to_keypoints` semantics (consumed by the reference via
    `predict/predict_joints2D.py:33-60`): each (S, S) heatmap is resized to
    the integer ROI size (ceil(w), ceil(h); min 1) with bicubic
    interpolation (align_corners=False) before the argmax, and the peak maps
    back through x = x1 + (xi + 0.5) * w / ceil(w).

    The ROI size is dynamic, so the resize is evaluated as two separable
    per-box weight matrices against a STATIC `grid_size` output grid
    (the paste_mask trick) with rows/columns >= the true ceil size masked
    out — bit-equivalent to d2's dynamic resize for every box up to
    `grid_size` px.  The (grid x grid) product is never materialised:
    a scan over `row_chunk`-row blocks carries a running max/argmax, so
    peak memory is R*row_chunk*grid_size*K.

    Args:
      heatmaps: (R, S, S, K); boxes: (R, 4) xyxy in the output frame —
        box sides must not exceed `grid_size` (boxes are clipped to the
        image, so the image size is always a safe grid).
    Returns:
      (R, K, 2) xy coords, (R, K) scores (the interpolated map value at
      the peak, d2's xy_preds[:, :, 2]).
    """
    R, S, _, K = heatmaps.shape
    x1, y1 = boxes[:, 0], boxes[:, 1]
    w = jnp.maximum(boxes[:, 2] - x1, 1.0)      # d2 clamps roi sides min 1
    h = jnp.maximum(boxes[:, 3] - y1, 1.0)
    wc = jnp.minimum(jnp.ceil(w), grid_size)
    hc = jnp.minimum(jnp.ceil(h), grid_size)
    n_chunks = -(-grid_size // row_chunk)
    G = n_chunks * row_chunk
    Wx = jax.vmap(lambda t: _bicubic_resize_weights(S, G, t))(wc)  # (R,G,S)
    Wy = jax.vmap(lambda t: _bicubic_resize_weights(S, G, t))(hc)
    # x-axis interpolation once; precision="highest" — sub-pixel peak
    # locations are exactly what bf16-ish default matmuls would blur.
    cols = jnp.einsum("rjik,rxi->rjxk", heatmaps, Wx,
                      precision="highest")                # (R, S, G, K)
    xmask = jnp.arange(G)[None, :] < wc[:, None]          # (R, G)

    wy_chunks = Wy.reshape(R, n_chunks, row_chunk, S).transpose(1, 0, 2, 3)

    def body(carry, wy_c):
        best, besty, bestx, base = carry
        block = jnp.einsum("rcj,rjxk->rcxk", wy_c, cols,
                           precision="highest")           # (R, C, G, K)
        yvalid = (base + jnp.arange(row_chunk))[None, :] < hc[:, None]
        m = yvalid[:, :, None] & xmask[:, None, :]
        block = jnp.where(m[..., None], block, -jnp.inf)
        flat = block.reshape(R, row_chunk * G, K)
        idx = jnp.argmax(flat, axis=1)                    # (R, K)
        val = jnp.take_along_axis(flat, idx[:, None, :], axis=1)[:, 0]
        yloc = base + idx // G
        xloc = idx % G
        upd = val > best
        return (jnp.where(upd, val, best), jnp.where(upd, yloc, besty),
                jnp.where(upd, xloc, bestx), base + row_chunk), None

    init = (jnp.full((R, K), -jnp.inf), jnp.zeros((R, K), jnp.int32),
            jnp.zeros((R, K), jnp.int32), jnp.asarray(0, jnp.int32))
    (scores, besty, bestx, _), _ = jax.lax.scan(body, init, wy_chunks)
    x = x1[:, None] + (bestx.astype(jnp.float32) + 0.5) * (w / wc)[:, None]
    y = y1[:, None] + (besty.astype(jnp.float32) + 0.5) * (h / hc)[:, None]
    return jnp.stack([x, y], axis=-1), scores


def pooled_box_features(fpn_feats: List[jnp.ndarray], boxes: jnp.ndarray,
                        output_size: int,
                        aligned: bool = True,
                        sampling_ratio: int = 0,
                        compute_dtype: str = None) -> jnp.ndarray:
    """ROIAlign over P2-P5 with FPN level assignment (`aligned=False` =
    the legacy ROIAlign pooler type DensePose configures).

    `sampling_ratio=0` (default) is detectron2's adaptive
    POOLER_SAMPLING_RATIO default — the KP-RCNN / PointRend configs leave
    it there for the box and keypoint poolers; DensePose pins 2
    (`DensePose/configs/Base-DensePose-RCNN-FPN.yaml:31`).

    `compute_dtype='bfloat16'` pools in bf16 via the MXU einsum
    formulation and returns f32 for the heads — paired with the bf16
    backbone opt-in, where the features are bf16-derived anyway (the
    down-cast is lossless), this removes the detector's hottest
    remaining op (the f32 pooling gather)."""
    if compute_dtype is not None:
        dt = jnp.dtype(compute_dtype)
        out = multilevel_roi_align([f.astype(dt) for f in fpn_feats[:4]],
                                   boxes, (4, 8, 16, 32),
                                   output_size, aligned=aligned,
                                   sampling_ratio=sampling_ratio)
        return out.astype(jnp.float32)
    return multilevel_roi_align(fpn_feats[:4], boxes, (4, 8, 16, 32),
                                output_size, aligned=aligned,
                                sampling_ratio=sampling_ratio)
