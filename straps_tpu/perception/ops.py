"""Core detection ops: IoU, static-shape NMS, box coding, ROIAlign.

TPU-native replacements for detectron2's C++/CUDA ops (reference §2.4 #2:
ROIAlign, NMS consumed via `predict/predict_3D.py:35-64`): everything is
static-shape and jittable — NMS is a fixed-trip greedy loop over top-k
candidates with masking instead of a dynamic-output CUDA kernel, and
ROIAlign is a batched bilinear gather.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) xyxy -> (...) areas."""
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * \
        jnp.maximum(boxes[..., 3] - boxes[..., 1], 0)


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) xyxy -> (N, M) IoU.

    Computed coordinate-wise as (N, M) planes — an (N, M, 2) intermediate
    would put 2 in the lane dimension, which TPU tiling pads to 128 (64x
    memory: a vmapped batch-8 NMS at 800^2 allocated 20.8GB that way)."""
    ix1 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    iy1 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    ix2 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    iy2 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
              max_outputs: int, block: int = 128
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact greedy NMS with static output size, blocked for TPU.

    A naive greedy loop is N sequential steps (each a tiny vector op) — at
    the 800^2 proposal count (N~4500) that dominated the whole detector
    forward (~0.5s/image).  This is the blocked formulation TPU NMS kernels
    use (tf.image.non_max_suppression_padded): process candidates in score
    order in blocks of `block`; within a block, iterate the monotone
    "suppressed by an alive higher-scorer" map to its fixpoint (exactly the
    greedy kept-set, a handful of iterations in practice); then suppress all
    later candidates with ONE (block, N) matrix op.  Sequential depth drops
    from N to ~N/block * (fixpoint iters + 1), and no (N, N) IoU matrix is
    ever materialised.

    Args:
      boxes: (N, 4) xyxy; scores: (N,); invalid candidates must carry
        score -inf.
    Returns:
      (max_outputs,) int32 indices into the input (padded with -1) and a
      (max_outputs,) bool validity mask.  Selection order = score order.
    """
    N = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    scores_s = scores[order]
    pad = (-N) % block
    if pad:
        boxes_s = jnp.concatenate(
            [boxes_s, jnp.zeros((pad, 4), boxes_s.dtype)])
        scores_s = jnp.concatenate(
            [scores_s, jnp.full((pad,), -jnp.inf, scores_s.dtype)])
    Np = boxes_s.shape[0]
    cols = jnp.arange(Np)

    def block_body(b, alive):
        start = b * block
        blk_boxes = jax.lax.dynamic_slice(boxes_s, (start, 0), (block, 4))
        # j (block row, global index start+j) suppresses strictly-later i.
        sup = pairwise_iou(blk_boxes, boxes_s) > iou_threshold   # (B, Np)
        rows = start + jnp.arange(block)[:, None]
        sup = sup & (cols[None, :] > rows)
        a_blk0 = jax.lax.dynamic_slice(alive, (start,), (block,))
        in_blk = jax.lax.dynamic_slice(sup, (0, start), (block, block))

        def self_cond(carry):
            return carry[1]

        def self_body(carry):
            a, _ = carry
            suppressed = jnp.any(in_blk & a[:, None], axis=0)    # (B,)
            a_new = a_blk0 & ~suppressed
            return a_new, jnp.any(a_new != a)

        a_blk, _ = jax.lax.while_loop(self_cond, self_body,
                                      (a_blk0, jnp.bool_(True)))
        # Alive block members suppress everything later in one shot.
        cross = jnp.any(sup & a_blk[:, None], axis=0)            # (Np,)
        alive = alive & ~(cross & (cols >= start + block))
        return jax.lax.dynamic_update_slice(alive, a_blk, (start,))

    alive = scores_s > -jnp.inf
    alive = jax.lax.fori_loop(0, Np // block, block_body, alive)
    alive = alive[:N]
    # Keep the first `max_outputs` alive candidates (score order).
    rank = jnp.cumsum(alive.astype(jnp.int32)) - 1          # rank among kept
    keep_slot = jnp.where(alive & (rank < max_outputs), rank, max_outputs)
    out_idx = jnp.full((max_outputs + 1,), -1, jnp.int32)
    out_idx = out_idx.at[keep_slot].set(order.astype(jnp.int32))[:max_outputs]
    return out_idx, out_idx >= 0


def encode_boxes(boxes: jnp.ndarray, anchors: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Faster-RCNN box coding: target boxes -> (dx, dy, dw, dh) deltas
    relative to anchors (both xyxy)."""
    wx, wy, ww, wh = weights
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + 0.5 * aw
    ay = anchors[..., 1] + 0.5 * ah
    bw = boxes[..., 2] - boxes[..., 0]
    bh = boxes[..., 3] - boxes[..., 1]
    bx = boxes[..., 0] + 0.5 * bw
    by = boxes[..., 1] + 0.5 * bh
    return jnp.stack([
        wx * (bx - ax) / aw, wy * (by - ay) / ah,
        ww * jnp.log(bw / aw), wh * jnp.log(bh / ah)], axis=-1)


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0),
                 clamp: float = 4.135) -> jnp.ndarray:
    """Inverse of `encode_boxes` (dw/dh clamped like detectron2's
    scale_clamp = log(1000/16))."""
    wx, wy, ww, wh = weights
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + 0.5 * aw
    ay = anchors[..., 1] + 0.5 * ah
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, clamp)
    dh = jnp.minimum(deltas[..., 3] / wh, clamp)
    cx = dx * aw + ax
    cy = dy * ah + ay
    w = jnp.exp(dw) * aw
    h = jnp.exp(dh) * ah
    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h,
                      cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def clip_boxes(boxes: jnp.ndarray, img_h: int, img_w: int) -> jnp.ndarray:
    x1 = jnp.clip(boxes[..., 0], 0, img_w)
    y1 = jnp.clip(boxes[..., 1], 0, img_h)
    x2 = jnp.clip(boxes[..., 2], 0, img_w)
    y2 = jnp.clip(boxes[..., 3], 0, img_h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bilinear_sample(features: jnp.ndarray, x: jnp.ndarray,
                    y: jnp.ndarray, mode: str = "zeros") -> jnp.ndarray:
    """Bilinear sampling of an (H, W, C) feature map at continuous
    (x, y) pixel coordinates (align-corners=False convention: coordinate x
    samples the continuous field whose texel centres are at integers).

    Two out-of-bounds semantics, matching the two torch ops this replaces:

    - ``mode="zeros"``: taps outside the map contribute zero — torch
      `grid_sample(padding_mode="zeros")`, the PointRend point-sampling /
      DensePose point-interp convention.
    - ``mode="border"``: torchvision/detectron2 ROIAlign's
      `bilinear_interpolate`: samples more than 1px outside the map are
      zero, samples in the 1px border band CLAMP to the edge pixel.  An
      edge-clipped detection's outermost sample rows hit this band on
      every real image; zero-padding there under-weights them by up to
      the full edge value.

    Args:
      x, y: (...,) coordinates.
    Returns:
      (..., C) sampled features.
    """
    H, W, _ = features.shape
    if mode == "border":
        valid = ((x >= -1.0) & (x <= W) & (y >= -1.0) & (y <= H))
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi):
        ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        return features[yc, xc] * ok[..., None]

    w00 = ((1 - fx) * (1 - fy))[..., None]
    w01 = (fx * (1 - fy))[..., None]
    w10 = ((1 - fx) * fy)[..., None]
    w11 = (fx * fy)[..., None]
    out = (tap(x0i, y0i) * w00 + tap(x0i + 1, y0i) * w01
           + tap(x0i, y0i + 1) * w10 + tap(x0i + 1, y0i + 1) * w11)
    if mode == "border":
        out = out * valid[..., None]
    return out


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio",
                                             "aligned", "mode"))
def roi_align(features: jnp.ndarray, boxes: jnp.ndarray, spatial_scale: float,
              output_size: int, sampling_ratio: int = 2,
              aligned: bool = True, mode: str = "border") -> jnp.ndarray:
    """ROIAlign. `aligned=True` is detectron2's ROIAlignV2 (half-pixel
    shift); `aligned=False` is the legacy "ROIAlign" pooler type the
    DensePose configs select (`DensePose/configs/Base-DensePose-RCNN-FPN.yaml`
    POOLER_TYPE, no shift).

    Args:
      features: (H, W, C) one feature level.
      boxes: (R, 4) xyxy in image coordinates.
    Returns:
      (R, output_size, output_size, C) pooled features.
    """
    boxes_f = boxes * spatial_scale - (0.5 if aligned else 0.0)
    x1, y1, x2, y2 = (boxes_f[:, i] for i in range(4))
    # Legacy (aligned=False) clamps the roi to >= 1px (torchvision
    # `max(roi_width, 1.)` backward compatibility); V2 has no minimum.
    # mode="zeros" + sampling_ratio=1 reproduces detectron2's regular-grid
    # `point_sample` (grid_sample zero padding) — the PointRend coarse
    # feature path; mode="border" is real ROIAlign.
    min_wh = (1e-6 if aligned else 1.0) if mode == "border" else 1e-6
    rw = jnp.maximum(x2 - x1, min_wh)
    rh = jnp.maximum(y2 - y1, min_wh)
    bin_w = rw / output_size
    bin_h = rh / output_size
    s = sampling_ratio
    if s == 0:
        # detectron2 adaptive sampling (POOLER_SAMPLING_RATIO=0): per-box
        # ceil(roi_extent / output_size) samples per bin, evaluated as
        # separable weight rows against the full map (the grid count is
        # data-dependent, so there is no static per-box sample tensor).
        # The static trip cap assumes in-image boxes: a box whose scaled
        # extent exceeds the feature map (possible only for boxes larger
        # than the image — d2 clips proposals/detections before pooling)
        # would want a larger grid and gets max_grid samples instead.
        if mode != "border":
            raise ValueError("adaptive sampling is a ROIAlign (border) "
                             "semantics; grid_sample paths use s>=1")
        H, W, _ = features.shape
        R, O = boxes.shape[0], output_size
        max_grid = max(1, -(-max(H, W) // output_size))
        gw_ext = rw if not aligned else (x2 - x1)
        gh_ext = rh if not aligned else (y2 - y1)
        gw = jnp.clip(jnp.ceil(gw_ext / output_size), 0, max_grid)
        gh = jnp.clip(jnp.ceil(gh_ext / output_size), 0, max_grid)
        ext_h = jnp.full((R,), H, jnp.int32)
        ext_w = jnp.full((R,), W, jnp.int32)
        ry = adaptive_axis_rows(y1, bin_h, gh, ext_h, O, H, max_grid)
        rx = adaptive_axis_rows(x1, bin_w, gw, ext_w, O, W, max_grid)
        prec = (None if features.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST)
        if features.dtype == jnp.bfloat16:
            ry = ry.astype(jnp.bfloat16)
            rx = rx.astype(jnp.bfloat16)
        rows = jnp.einsum("rph,hwc->rpwc", ry, features, precision=prec)
        return jnp.einsum("rqw,rpwc->rpqc", rx, rows,
                          precision=prec).astype(features.dtype)
    # Sample grid: for output bin (i, j), s x s points at fractions
    # (k + 0.5)/s within the bin.
    grid = (jnp.arange(output_size * s) + 0.5) / s  # in bin units
    xs = x1[:, None] + bin_w[:, None] * grid[None, :]   # (R, O*s)
    ys = y1[:, None] + bin_h[:, None] * grid[None, :]

    def pool_one(f_xs, f_ys):
        xx = jnp.tile(f_xs[None, :], (output_size * s, 1))
        yy = jnp.tile(f_ys[:, None], (1, output_size * s))
        samples = bilinear_sample(features, xx, yy, mode=mode)
        C = samples.shape[-1]
        samples = samples.reshape(output_size, s, output_size, s, C)
        return samples.mean(axis=(1, 3))

    return jax.vmap(pool_one)(xs, ys)


def multilevel_roi_align(features_per_level, boxes: jnp.ndarray,
                         strides, output_size: int,
                         canonical_level: int = 4,
                         canonical_size: float = 224.0,
                         sampling_ratio: int = 2,
                         aligned: bool = True,
                         method: str = "auto") -> jnp.ndarray:
    """FPN level assignment + ROIAlign from a PACKED pyramid.

    detectron2 `assign_boxes_to_levels`: level = floor(4 + log2(sqrt(area)
    / 224)).  Two TPU formulations, identical math:

    - ``method="einsum"``: bilinear interpolation is separable,
      so pooling is two small matmuls against a y-packed pyramid instead
      of an HBM gather — `out[r,i,j] = Ry[r,i,:] @ F @ Rx[r,j,:]^T` where
      the R matrices carry the bilinear weights, the 1/s sample average,
      and the tap-validity zeros.  Gathers of (R, Q, Q, C) rows are the
      detector's hottest op (64 ms for 512 boxes at 800², as much as a
      third of the whole R50-FPN backbone); the same pooling as matmuls
      rides the MXU.
    - ``method="gather"``: the r3 packed-flat-buffer gather (each box
      gathers through its own level's offset/stride — one level's
      traffic), kept as the cross-check oracle.
    - ``method="auto"`` (default): einsum for bf16 features (the matmuls
      ride the MXU natively: 64 -> ~3 ms for 512 boxes at 800² on v5e),
      gather for f32 (the einsum needs `precision="highest"` for the
      float-tolerance guarantee, and the 3-pass f32 contraction measures
      *slower* than the gather: 71 vs 64 ms).
    """
    import math

    C = features_per_level[0].shape[-1]
    if sampling_ratio == 0:
        # Adaptive sampling (detectron2 POOLER_SAMPLING_RATIO=0): only the
        # separable-rows formulation supports per-box sample counts without
        # a (R, Q, Q, C) gather whose Q scales with the largest grid.
        if method == "gather":
            raise ValueError("sampling_ratio=0 (adaptive) requires the "
                             "einsum formulation")
        method = "einsum"
    if method == "auto":
        method = ("einsum" if features_per_level[0].dtype == jnp.bfloat16
                  else "gather")
    if method == "einsum":
        return _multilevel_roi_align_mm(
            features_per_level, boxes, strides, output_size,
            canonical_level, canonical_size, sampling_ratio, aligned)
    hs = [int(f.shape[0]) for f in features_per_level]
    ws = [int(f.shape[1]) for f in features_per_level]
    flat = jnp.concatenate([f.reshape(-1, C) for f in features_per_level])
    offsets = np.cumsum([0] + [h * w for h, w in zip(hs, ws)])[:-1]

    area = box_area(boxes)
    lvl = jnp.floor(canonical_level +
                    jnp.log2(jnp.sqrt(jnp.maximum(area, 1e-9)) /
                             canonical_size + 1e-9))
    min_l = int(math.log2(strides[0]))
    max_l = min_l + len(features_per_level) - 1
    li = (jnp.clip(lvl, min_l, max_l) - min_l).astype(jnp.int32)   # (R,)

    scale = jnp.asarray([1.0 / s for s in strides], jnp.float32)[li]
    Hb = jnp.asarray(hs, jnp.int32)[li]
    Wb = jnp.asarray(ws, jnp.int32)[li]
    off = jnp.asarray(offsets, jnp.int32)[li]

    shift = 0.5 if aligned else 0.0
    boxes_f = boxes * scale[:, None] - shift
    x1, y1, x2, y2 = (boxes_f[:, i] for i in range(4))
    min_wh = 1e-6 if aligned else 1.0   # legacy max(roi_width, 1.) clamp
    bin_w = jnp.maximum(x2 - x1, min_wh) / output_size
    bin_h = jnp.maximum(y2 - y1, min_wh) / output_size
    s = sampling_ratio
    grid = (jnp.arange(output_size * s) + 0.5) / s               # bin units
    xs = x1[:, None] + bin_w[:, None] * grid[None, :]            # (R, Q)
    ys = y1[:, None] + bin_h[:, None] * grid[None, :]
    # torchvision border semantics (see `bilinear_sample(mode="border")`):
    # samples >1px outside the level are zero, the 1px band clamps.
    Wbf = Wb.astype(jnp.float32)[:, None]
    Hbf = Hb.astype(jnp.float32)[:, None]
    valid_x = ((xs >= -1.0) & (xs <= Wbf))[:, None, :]           # (R, 1, Q)
    valid_y = ((ys >= -1.0) & (ys <= Hbf))[:, :, None]           # (R, Q, 1)
    xs = jnp.clip(xs, 0.0, Wbf - 1.0)
    ys = jnp.clip(ys, 0.0, Hbf - 1.0)
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = (xs - x0)[:, None, :]                                   # (R, 1, Q)
    fy = (ys - y0)[:, :, None]                                   # (R, Q, 1)
    x0i = x0.astype(jnp.int32)[:, None, :]
    y0i = y0.astype(jnp.int32)[:, :, None]
    Wb3 = Wb[:, None, None]
    Hb3 = Hb[:, None, None]
    off3 = off[:, None, None]

    def tap(xi, yi):
        ok = (xi >= 0) & (xi < Wb3) & (yi >= 0) & (yi < Hb3)
        xc = jnp.clip(xi, 0, Wb3 - 1)
        yc = jnp.clip(yi, 0, Hb3 - 1)
        samples = flat[off3 + yc * Wb3 + xc]                     # (R, Q, Q, C)
        return samples * ok[..., None]

    out = (tap(x0i, y0i) * ((1 - fx) * (1 - fy))[..., None]
           + tap(x0i + 1, y0i) * (fx * (1 - fy))[..., None]
           + tap(x0i, y0i + 1) * ((1 - fx) * fy)[..., None]
           + tap(x0i + 1, y0i + 1) * (fx * fy)[..., None])
    out = out * (valid_x & valid_y)[..., None]
    R = boxes.shape[0]
    out = out.reshape(R, output_size, s, output_size, s, C)
    return out.mean(axis=(2, 4))


def bilinear_axis_rows(coord: jnp.ndarray, extent: jnp.ndarray, length: int,
                       offset=None, mode: str = "zeros") -> jnp.ndarray:
    """Per-sample bilinear tap weights along one axis as a dense row.

    Args:
      coord: (R, Q) continuous sample coordinates on this axis.
      extent: (R,) valid size of each box's level on this axis.
      length: row length (packed axis size).
      offset: optional (R,) packed-axis offset of each box's level.
      mode: out-of-bounds semantics like `bilinear_sample`: "zeros"
        (grid_sample — mask paste / point sampling) or "border"
        (torchvision ROIAlign: the 1px band clamps to the edge texel,
        beyond it weights are zero).
    Returns:
      (R, Q, length) rows with >=0..2 nonzero bilinear weights each.
    """
    if mode == "border":
        extf = extent.astype(jnp.float32)[:, None]
        in_band = (coord >= -1.0) & (coord <= extf)              # (R, Q)
        coord = jnp.clip(coord, 0.0, extf - 1.0)
    c0 = jnp.floor(coord)
    frac = coord - c0
    c0i = c0.astype(jnp.int32)
    pos = jnp.arange(length, dtype=jnp.int32)
    ext = extent[:, None, None]
    base = offset[:, None, None] if offset is not None else 0

    def tap(ci, w):
        valid = (ci >= 0) & (ci < ext)
        hit = pos[None, None, :] == (base + ci)
        return jnp.where(valid & hit, w, 0.0)

    rows = (tap(c0i[:, :, None], (1.0 - frac)[:, :, None])
            + tap(c0i[:, :, None] + 1, frac[:, :, None]))
    if mode == "border":
        rows = rows * in_band[..., None]
    return rows


def adaptive_axis_rows(start: jnp.ndarray, bin_sz: jnp.ndarray,
                       grid: jnp.ndarray, extent: jnp.ndarray,
                       output_size: int, length: int, max_grid: int,
                       offset=None, mode: str = "border") -> jnp.ndarray:
    """Per-box ADAPTIVE-sample bilinear rows along one axis (detectron2
    `POOLER_SAMPLING_RATIO=0`): box r takes ``grid[r]`` samples per output
    bin at fractions (k + 0.5) / grid[r], summed and divided by
    max(grid[r], 1) — together with the other axis this reproduces
    torchvision's `count = max(grid_h * grid_w, 1)` average exactly
    (boxes with grid == 0 get all-zero rows, i.e. d2's zero output for
    degenerate aligned ROIs).

    Args:
      start: (R,) axis start in feature coords; bin_sz: (R,) bin size;
      grid: (R,) int sample counts (<= `max_grid`, the static loop trip).
    Returns:
      (R, output_size, length) weight rows.
    """
    ph = jnp.arange(output_size, dtype=jnp.float32)[None, :]     # (1, O)
    g = jnp.maximum(grid, 1).astype(jnp.float32)
    R = start.shape[0]

    def body(k, acc):
        frac = (k + 0.5) / g                                     # (R,)
        coord = start[:, None] + bin_sz[:, None] * (ph + frac[:, None])
        rows_k = bilinear_axis_rows(coord, extent, length,
                                    offset=offset, mode=mode)
        w = jnp.where(k < grid, 1.0 / g, 0.0)                    # (R,)
        return acc + rows_k * w[:, None, None]

    acc0 = jnp.zeros((R, output_size, length), jnp.float32)
    return jax.lax.fori_loop(0, max_grid, body, acc0)


def _multilevel_roi_align_mm(features_per_level, boxes, strides,
                             output_size, canonical_level, canonical_size,
                             sampling_ratio, aligned):
    """ROIAlign as two einsums (see `multilevel_roi_align` docstring).

    Levels are packed along y into one (sum H_l, max W_l, C) buffer (zero
    padding right of narrow levels is never touched: x-taps beyond a
    level's width get zero weight).  f32 features contract at
    `precision="highest"` so results match the gather path to float
    tolerance; bf16 features ride the MXU natively.
    """
    import math

    C = features_per_level[0].shape[-1]
    hs = [int(f.shape[0]) for f in features_per_level]
    ws = [int(f.shape[1]) for f in features_per_level]
    Wmax = max(ws)
    Hsum = sum(hs)
    packed = jnp.concatenate(
        [jnp.pad(f, ((0, 0), (0, Wmax - w), (0, 0)))
         for f, w in zip(features_per_level, ws)], axis=0)   # (Hsum, Wmax, C)
    y_offsets = np.cumsum([0] + hs)[:-1]

    area = box_area(boxes)
    lvl = jnp.floor(canonical_level +
                    jnp.log2(jnp.sqrt(jnp.maximum(area, 1e-9)) /
                             canonical_size + 1e-9))
    min_l = int(math.log2(strides[0]))
    max_l = min_l + len(features_per_level) - 1
    li = (jnp.clip(lvl, min_l, max_l) - min_l).astype(jnp.int32)   # (R,)

    scale = jnp.asarray([1.0 / s for s in strides], jnp.float32)[li]
    Hb = jnp.asarray(hs, jnp.int32)[li]
    Wb = jnp.asarray(ws, jnp.int32)[li]
    off_y = jnp.asarray(y_offsets, jnp.int32)[li]

    shift = 0.5 if aligned else 0.0
    boxes_f = boxes * scale[:, None] - shift
    x1, y1, x2, y2 = (boxes_f[:, i] for i in range(4))
    min_wh = 1e-6 if aligned else 1.0   # legacy max(roi_width, 1.) clamp
    rw = jnp.maximum(x2 - x1, min_wh)
    rh = jnp.maximum(y2 - y1, min_wh)
    bin_w = rw / output_size
    bin_h = rh / output_size
    s = sampling_ratio
    R, O = boxes.shape[0], output_size
    if s == 0:
        # detectron2's adaptive POOLER_SAMPLING_RATIO=0: per-box
        # grid = ceil(roi_extent / output_size) samples per bin per axis
        # (torchvision roi_align; the roi extent is the legacy-clamped one
        # for aligned=False and the RAW one for aligned=True, where a
        # degenerate roi gives grid 0 -> a zero output bin).  The static
        # loop trip covers the largest grid any clipped box can need on
        # this pyramid: boxes live in image coords, so a box's extent at
        # its assigned level is at most the finest level's size.
        max_grid = max(1, -(-max(hs[0], ws[0]) // output_size))
        gw_ext = rw if not aligned else (x2 - x1)
        gh_ext = rh if not aligned else (y2 - y1)
        gw = jnp.clip(jnp.ceil(gw_ext / output_size), 0, max_grid)
        gh = jnp.clip(jnp.ceil(gh_ext / output_size), 0, max_grid)
        ry = adaptive_axis_rows(y1, bin_h, gh, Hb, O, Hsum, max_grid,
                                offset=off_y, mode="border")
        rx = adaptive_axis_rows(x1, bin_w, gw, Wb, O, Wmax, max_grid,
                                mode="border")
    else:
        grid = (jnp.arange(output_size * s) + 0.5) / s           # bin units
        xs = x1[:, None] + bin_w[:, None] * grid[None, :]        # (R, Q)
        ys = y1[:, None] + bin_h[:, None] * grid[None, :]
        # Fold the s-sample-per-bin average into the weight rows:
        # (R, O, axis); "border" = torchvision ROIAlign out-of-bounds
        # semantics.
        ry = bilinear_axis_rows(ys, Hb, Hsum, offset=off_y, mode="border")
        ry = ry.reshape(R, O, s, Hsum).sum(axis=2) / s
        rx = bilinear_axis_rows(xs, Wb, Wmax, mode="border")
        rx = rx.reshape(R, O, s, Wmax).sum(axis=2) / s

    if packed.dtype == jnp.bfloat16:
        prec = None
        ry = ry.astype(jnp.bfloat16)
        rx = rx.astype(jnp.bfloat16)
    else:
        prec = jax.lax.Precision.HIGHEST
    rows = jnp.einsum("rph,hwc->rpwc", ry, packed, precision=prec)
    out = jnp.einsum("rqw,rpwc->rpqc", rx, rows, precision=prec)
    return out.astype(packed.dtype)
