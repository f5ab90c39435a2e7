"""Bounding-box math and on-device crop-and-resize.

This replaces the reference's worst bottleneck: a per-sample Python loop that
moves the rendered segmentation GPU->CPU, crops with numpy slicing and resizes
with cv2 (`utils/image_utils.py:44-105`, called from
`train/train_synthetic_otf_rendering.py:158-170`).  The TPU-native design
keeps everything on device: the bbox is found with masked reductions and the
crop+nearest-resize is a single gather with a dynamically-computed affine
index map — fixed 256x256 output shape, so it jits and batches cleanly.

Nearest-neighbour sampling uses cv2's INTER_NEAREST convention
(src = floor(dst * src_size / dst_size)).
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def mask_bounding_box(mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray,
                                                  jnp.ndarray, jnp.ndarray]:
    """Tight bbox (row_min, row_max, col_min, col_max) of nonzero pixels.

    Equivalent to `np.argwhere(mask != 0)` min/max in
    `utils/image_utils.py:57-59`, computed with reductions instead of a
    host-side argwhere.

    Args:
      mask: (H, W) array; nonzero = foreground.
    Returns:
      Scalars (r0, r1, c0, c1), inclusive bounds, int32.  All zeros if the
      mask is empty.
    """
    fg = mask != 0
    h, w = mask.shape
    rows = jnp.any(fg, axis=1)
    cols = jnp.any(fg, axis=0)
    ridx = jnp.arange(h, dtype=jnp.int32)
    cidx = jnp.arange(w, dtype=jnp.int32)
    big = jnp.int32(1 << 30)
    r0 = jnp.min(jnp.where(rows, ridx, big))
    r1 = jnp.max(jnp.where(rows, ridx, -big))
    c0 = jnp.min(jnp.where(cols, cidx, big))
    c1 = jnp.max(jnp.where(cols, cidx, -big))
    empty = ~jnp.any(rows)
    zero = jnp.int32(0)
    return (jnp.where(empty, zero, r0), jnp.where(empty, zero, r1),
            jnp.where(empty, zero, c0), jnp.where(empty, zero, c1))


def _nearest_resample(seg: jnp.ndarray, r_start: jnp.ndarray, c_start: jnp.ndarray,
                      crop_h: jnp.ndarray, crop_w: jnp.ndarray,
                      out_wh: int) -> jnp.ndarray:
    """`seg[r_start + floor(y*crop_h/out), c_start + floor(x*crop_w/out)]`
    with zero padding outside the source image.

    Formulated as two one-hot matmuls (`Ry @ seg @ Rx^T`) rather than a
    row+lane gather: TPU gathers run near scalar rate, and the vmapped
    gather was ~all of the non-render synthetic-batch cost (31.6 ms at
    B=140 256²).  Exactness: each one-hot row has a single 1.0, so every
    output is a one-term f32 product — bit-identical to the gather
    (`precision="highest"` keeps XLA from bf16-splitting the inputs)."""
    h, w = seg.shape
    ys = jnp.arange(out_wh, dtype=jnp.float32)
    src_r = r_start + jnp.floor(ys * crop_h.astype(jnp.float32) / out_wh).astype(jnp.int32)
    src_c = c_start + jnp.floor(ys * crop_w.astype(jnp.float32) / out_wh).astype(jnp.int32)
    valid_r = (src_r >= 0) & (src_r < h)
    valid_c = (src_c >= 0) & (src_c < w)
    gr = jnp.clip(src_r, 0, h - 1)
    gc = jnp.clip(src_c, 0, w - 1)
    if not jnp.issubdtype(seg.dtype, jnp.floating):
        out = seg[gr][:, gc]
        return out * (valid_r[:, None] & valid_c[None, :]).astype(seg.dtype)
    ry = ((jnp.arange(h, dtype=jnp.int32)[None, :] == gr[:, None])
          & valid_r[:, None]).astype(seg.dtype)              # (out, h)
    rx = ((jnp.arange(w, dtype=jnp.int32)[None, :] == gc[:, None])
          & valid_c[:, None]).astype(seg.dtype)              # (out, w)
    return jnp.einsum("oh,hw,xw->ox", ry, seg, rx,
                      precision=jax.lax.Precision.HIGHEST)


def crop_and_resize_seg_joints(seg: jnp.ndarray, joints2d: jnp.ndarray,
                               out_wh: int,
                               scale_factor: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-sample crop to the (jittered) silhouette bbox + nearest resize.

    Reproduces `batch_crop_seg_to_bounding_box` + `batch_resize`
    (`utils/image_utils.py:44-105`) semantics: square bbox of side
    max(h, w)*scale_factor around the (possibly jittered) centre, truncated at
    the image border (no padding — the crop simply gets smaller, changing the
    aspect ratio, exactly like numpy slicing does in the reference).

    Args:
      seg: (H, W) part segmentation (float or int).
      joints2d: (J, 2) pixel joints (x, y).
      out_wh: output side length.
      scale_factor: scalar bbox expansion factor (may include jitter); the
        centre jitter is folded in by the caller via `centre_offset` below.
    Returns:
      (out_wh, out_wh) resized seg, (J, 2) transformed joints.
    """
    return crop_and_resize_seg_joints_centre(seg, joints2d, out_wh, scale_factor,
                                             jnp.zeros(2, dtype=jnp.float32))


def square_bbox_corners(seg: jnp.ndarray, scale_factor,
                        centre_offset=None):
    """UNCLAMPED int32 corners of the square silhouette-bbox crop.

    The one copy of the centre/side/truncation convention every crop path
    shares (train jittered crop, inference padded crop; host mirrors:
    `eval_harness.runner.silhouette_crop_box`,
    `predict.pipeline.crop_image_like_proxy`).  Corners truncate toward
    zero like the reference's `.astype(np.int16)`; arithmetic is float32 —
    the host mirrors must match it (f64 truncates differently for
    near-integral half-extents).

    Returns (top_r, top_c, bot_r, bot_c) int32 scalars.
    """
    r0, r1, c0, c1 = mask_bounding_box(seg)
    centre_r = (r0 + r1).astype(jnp.float32) / 2.0
    centre_c = (c0 + c1).astype(jnp.float32) / 2.0
    if centre_offset is not None:
        centre_r = centre_r + centre_offset[0]
        centre_c = centre_c + centre_offset[1]
    bb_h = (r1 - r0).astype(jnp.float32)
    bb_w = (c1 - c0).astype(jnp.float32)
    wh = jnp.maximum(bb_h, bb_w) * scale_factor
    top_r = (centre_r - wh / 2.0).astype(jnp.int32)
    top_c = (centre_c - wh / 2.0).astype(jnp.int32)
    bot_r = (centre_r + wh / 2.0).astype(jnp.int32)
    bot_c = (centre_c + wh / 2.0).astype(jnp.int32)
    return top_r, top_c, bot_r, bot_c


def crop_and_resize_seg_joints_centre(seg: jnp.ndarray, joints2d: jnp.ndarray,
                                      out_wh: int, scale_factor: jnp.ndarray,
                                      centre_offset: jnp.ndarray
                                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """As `crop_and_resize_seg_joints` with an additive (row, col) centre jitter."""
    h, w = seg.shape
    # Corners clamp at 0 — matches the reference's `top_left[top_left < 0] = 0`.
    top_r, top_c, bot_r, bot_c = square_bbox_corners(seg, scale_factor,
                                                     centre_offset)
    top_r_cl = jnp.maximum(top_r, 0)
    top_c_cl = jnp.maximum(top_c, 0)
    bot_r_cl = jnp.maximum(bot_r, 0)
    bot_c_cl = jnp.maximum(bot_c, 0)
    # numpy slicing truncates at the image size.
    crop_h = jnp.maximum(jnp.minimum(bot_r_cl, h) - top_r_cl, 1)
    crop_w = jnp.maximum(jnp.minimum(bot_c_cl, w) - top_c_cl, 1)
    out = _nearest_resample(seg, top_r_cl, top_c_cl, crop_h, crop_w, out_wh)
    # Joints: subtract the clamped top-left (col, row), then scale.
    shifted = joints2d - jnp.stack([top_c_cl, top_r_cl]).astype(jnp.float32)
    scale = jnp.stack([out_wh / crop_w.astype(jnp.float32),
                       out_wh / crop_h.astype(jnp.float32)])
    return out, shifted * scale


def crop_and_resize_padded(seg: jnp.ndarray, joints2d: jnp.ndarray, out_wh: int,
                           scale_factor: float = 1.2
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inference-path crop: square bbox, zero-padded where it leaves the image.

    Reproduces `crop_and_resize_silhouette_joints`
    (`utils/image_utils.py:108-163`): the crop is padded to the full square
    before resizing, and joints are offset by the *unclamped* top-left corner.
    """
    h, w = seg.shape
    top_r, top_c, bot_r, bot_c = square_bbox_corners(seg, scale_factor)
    crop_h = jnp.maximum(bot_r - top_r, 1)
    crop_w = jnp.maximum(bot_c - top_c, 1)
    out = _nearest_resample(seg, top_r, top_c, crop_h, crop_w, out_wh)
    shifted = joints2d - jnp.stack([top_c, top_r]).astype(jnp.float32)
    scale = jnp.stack([out_wh / crop_w.astype(jnp.float32),
                       out_wh / crop_h.astype(jnp.float32)])
    return out, shifted * scale


def batch_crop_and_resize(segs: jnp.ndarray, joints2d: jnp.ndarray, out_wh: int,
                          scale_factors: jnp.ndarray,
                          centre_offsets: jnp.ndarray
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """vmapped `crop_and_resize_seg_joints_centre` over the batch.

    Args:
      segs: (B, H, W)
      joints2d: (B, J, 2)
      scale_factors: (B,)
      centre_offsets: (B, 2) additive (row, col) jitter
    Returns:
      (B, out_wh, out_wh) segs and (B, J, 2) joints.
    """
    return jax.vmap(
        lambda s, j, sf, co: crop_and_resize_seg_joints_centre(s, j, out_wh, sf, co)
    )(segs, joints2d, scale_factors, centre_offsets)


def pad_to_square_params(height: int, width: int) -> Tuple[int, int]:
    """Border widths for `pad_to_square` (`utils/image_utils.py:6-21`)."""
    if width < height:
        return 0, (height - width) // 2
    return (width - height) // 2, 0


def pad_to_square(image):
    """Zero-pad an (H, W[, C]) image to square
    (`utils/image_utils.py:6-21` semantics)."""
    import numpy as np
    h, w = image.shape[:2]
    top, left = pad_to_square_params(h, w)
    pads = [(top, top), (left, left)] + [(0, 0)] * (image.ndim - 2)
    return np.pad(np.asarray(image), pads)
