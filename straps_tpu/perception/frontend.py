"""Predict-time perception wrappers.

Equivalents of the reference's per-detector wrappers: largest-roughly-centred
instance selection (`predict/predict_joints2D.py:5-30`,
`predict/predict_silhouette_pointrend.py:7-36`), keypoint extraction and
binary-silhouette extraction.  Selection runs in numpy on the (tiny) static
detection outputs; the heavy model forwards are jitted.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def get_largest_centred_box_index(boxes: np.ndarray, valid: np.ndarray,
                                  orig_w: int, orig_h: int) -> int:
    """Largest box whose centre is within orig_w/6 of the image centre, else
    simply the largest (`predict/predict_joints2D.py:5-30` semantics)."""
    boxes = np.asarray(boxes)
    valid = np.asarray(valid).astype(bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    areas = np.where(valid, areas, -1.0)
    order = np.argsort(-areas)
    for idx in order:
        if not valid[idx]:
            continue
        cx = (boxes[idx, 0] + boxes[idx, 2]) / 2.0
        cy = (boxes[idx, 1] + boxes[idx, 3]) / 2.0
        if (abs(cx - orig_w / 2.0) < orig_w / 6.0 and
                abs(cy - orig_h / 2.0) < orig_w / 6.0):
            return int(idx)
    return int(order[0])


def get_largest_centred_mask_index(masks: np.ndarray, valid: np.ndarray,
                                   orig_w: int, orig_h: int) -> int:
    """Largest mask whose bbox centre is roughly centred (row tolerance
    orig_w/4, column tolerance orig_w/6 —
    `predict/predict_silhouette_pointrend.py:7-36` semantics)."""
    masks = np.asarray(masks)
    valid = np.asarray(valid).astype(bool)
    areas = masks.sum(axis=(1, 2))
    areas = np.where(valid, areas, -1.0)
    order = np.argsort(-areas)
    for idx in order:
        if not valid[idx] or areas[idx] <= 0:
            continue
        rows, cols = np.nonzero(masks[idx])
        cr = (rows.min() + rows.max()) / 2.0
        cc = (cols.min() + cols.max()) / 2.0
        if (abs(cr - orig_h / 2.0) < orig_w / 4.0 and
                abs(cc - orig_w / 2.0) < orig_w / 6.0):
            return int(idx)
    return int(order[0])


def make_apply_fn(model, variables):
    """One jitted apply for repeated per-image calls (avoids re-tracing).

    Variables are passed as a jit ARGUMENT, not closed over: closed-over
    arrays are baked into the program as constants, which bloats the
    serialized executable by the full weight size (the axon remote-compile
    service rejects DensePose-R101-sized programs with HTTP 413) and slows
    every compile."""
    jitted = jax.jit(lambda v, img: model.apply(v, img))
    return lambda img: jitted(variables, img)


# Pillow's 8-bit fixed-point coefficient precision (Resample.c
# PRECISION_BITS = 32 - 8 - 2).
_PIL_PRECISION_BITS = 22


def _pil_axis_coeffs(in_size: int, out_size: int, quantise: bool = True):
    """Pillow `precompute_coeffs` (+ `normalize_coeffs_8bpc` when
    `quantise`) for the BILINEAR (triangle, support 1) filter: per-output-
    pixel tap indices (out, k) and weights — fixed-point 2^-22 steps after
    a double normalisation for the uint8 path, raw doubles for the float
    path.  Kept in tap (gather) form: a dense int matrix has no BLAS path
    in numpy and runs at scalar speed."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = filterscale  # bilinear support 1.0 * filterscale
    centers = (np.arange(out_size, dtype=np.float64) + 0.5) * scale
    xmin = np.maximum((centers - support + 0.5).astype(np.int64), 0)
    xmax = np.minimum((centers + support + 0.5).astype(np.int64), in_size)
    ksize = int(np.ceil(support)) * 2 + 1
    taps = xmin[:, None] + np.arange(ksize)[None, :]          # (out, k)
    w = 1.0 - np.abs((taps + 0.5 - centers[:, None]) / filterscale)
    w = np.where((w > 0) & (taps < xmax[:, None]), w, 0.0)
    w = w / w.sum(axis=1, keepdims=True)
    if quantise:
        w = np.where(w < 0, w * (1 << _PIL_PRECISION_BITS) - 0.5,
                     w * (1 << _PIL_PRECISION_BITS) + 0.5).astype(np.int64)
    # Out-of-range taps carry weight 0; clip their index to a real texel.
    return np.minimum(taps, in_size - 1), w


def _pil_axis_pass(img: np.ndarray, coeffs, axis: int) -> np.ndarray:
    """One fixed-point resample pass: int accumulate over the <=k taps,
    +0.5 ulp rounding, >> PRECISION_BITS, clip to uint8 (Pillow
    ImagingResampleHorizontal_8bpc semantics).  Tap products fit exactly:
    255 * 2^22 * ksize << 2^63."""
    taps, kk = coeffs
    m = np.moveaxis(img, axis, 0).astype(np.int64)            # (in, ...)
    tail = (1,) * (m.ndim - 1)
    acc = np.full((taps.shape[0],) + m.shape[1:],
                  1 << (_PIL_PRECISION_BITS - 1), np.int64)
    for k in range(taps.shape[1]):                            # <= ksize taps
        acc += m[taps[:, k]] * kk[:, k].reshape((-1,) + tail)
    out = np.clip(acc >> _PIL_PRECISION_BITS, 0, 255).astype(np.uint8)
    return np.moveaxis(out, 0, axis)


def pil_bilinear_resize_u8(image: np.ndarray, out_w: int, out_h: int,
                           allow_pil: bool = True) -> np.ndarray:
    """Bit-exact Pillow `Image.resize((w, h), BILINEAR)` on a uint8
    (H, W, C) array — what detectron2's ResizeShortestEdge actually
    computes (`ResizeTransform.apply_image` -> PIL).  Uses Pillow itself
    when importable (it IS the reference implementation, and its C loops
    are ~10x the numpy fallback); otherwise a first-party numpy
    reimplementation: per-axis triangle-filter coefficients normalised in
    double and quantised to 2^-22 fixed point, horizontal pass then
    vertical, Pillow's round-half-up and uint8 clip after EACH pass.
    Both paths are asserted bit-identical in `TestPilExactResize`.

    uint8 input only — the fixed-point pipeline is a uint8 semantics;
    float images go through `bilinear_resize_f32` (faithful float
    triangle filter) via `_resize_for_test`'s dtype dispatch."""
    img = np.asarray(image)
    if img.dtype != np.uint8:
        raise TypeError(
            f"pil_bilinear_resize_u8 is uint8-only (got {img.dtype}); "
            "float images would wrap mod-256 — use bilinear_resize_f32")
    if allow_pil:
        try:
            from PIL import Image
            return np.asarray(Image.fromarray(img).resize(
                (out_w, out_h), Image.BILINEAR))
        except ImportError:
            pass
    if img.shape[1] != out_w:
        img = _pil_axis_pass(img, _pil_axis_coeffs(img.shape[1], out_w), 1)
    if img.shape[0] != out_h:
        img = _pil_axis_pass(img, _pil_axis_coeffs(img.shape[0], out_h), 0)
    return img


def bilinear_resize_f32(image: np.ndarray, out_w: int, out_h: int
                        ) -> np.ndarray:
    """Pillow-semantics BILINEAR resize for float images (what PIL does
    on mode-'F' data): the same double triangle coefficients as the uint8
    path but unquantised, no rounding, no clip.  For already-normalised /
    float RGB callers of the detector front-end."""
    img = np.asarray(image, np.float64)
    for axis, out_size in ((1, out_w), (0, out_h)):
        if img.shape[axis] == out_size:
            continue
        taps, w = _pil_axis_coeffs(img.shape[axis], out_size,
                                   quantise=False)
        m = np.moveaxis(img, axis, 0)
        tail = (1,) * (m.ndim - 1)
        acc = np.zeros((taps.shape[0],) + m.shape[1:], np.float64)
        for k in range(taps.shape[1]):
            acc += m[taps[:, k]] * w[:, k].reshape((-1,) + tail)
        img = np.moveaxis(acc, 0, axis)
    return img.astype(np.asarray(image).dtype
                      if np.issubdtype(np.asarray(image).dtype, np.floating)
                      else np.float32)


def _resize_for_test(image_rgb: np.ndarray, test_size) -> np.ndarray:
    """detectron2 DefaultPredictor preprocessing: ResizeShortestEdge to
    INPUT.MIN_SIZE_TEST (800) before the network — the reference feeds a
    square image, so this is a plain square resize with PIL-bilinear
    semantics (bit-exact fixed-point reimplementation for uint8 input —
    what d2's PIL path sees; faithful float triangle filter for float
    callers)."""
    if not test_size or image_rgb.shape[:2] == (test_size, test_size):
        # Both dims must match: an 800-tall non-square image fed through
        # unresized would misalign anchors/clipping on the width axis.
        return image_rgb
    img = np.asarray(image_rgb)
    if img.dtype == np.uint8:
        return pil_bilinear_resize_u8(img, test_size, test_size)
    return bilinear_resize_f32(img, test_size, test_size)


_BIT_WEIGHTS = np.asarray([128, 64, 32, 16, 8, 4, 2, 1], np.uint8)


def _pack_mask_bits(out: dict) -> dict:
    """Transport-only: pack binary masks 8-pixels-per-byte on device (the
    tunneled backend pulls ~24 MB/s, so mask bytes dominate the chunk
    round trip).  Inverse of `np.unpackbits(..., axis=-1)`."""
    m = out.get("masks")
    if m is None or m.dtype != jnp.bool_ or m.shape[-1] % 8:
        return out
    out = dict(out)
    m8 = m.reshape(m.shape[:-1] + (m.shape[-1] // 8, 8)).astype(jnp.uint8)
    out["masks"] = (m8 * _BIT_WEIGHTS).sum(axis=-1).astype(jnp.uint8)
    out["_masks_width"] = m.shape[-1]
    return out


def _unpack_mask_bits(out: dict) -> dict:
    w = out.pop("_masks_width", None)
    if w is not None:
        packed = out["masks"]
        out["masks"] = np.unpackbits(
            packed, axis=-1, count=int(w)).astype(bool)
    return out


def make_batched_apply_fn(model, variables, normalise: bool = False):
    """One jitted, image-batched apply: the per-image model vmapped over a
    stacked (N, H, W, 3) batch.  O(1) jitted calls per folder instead of the
    reference's per-image GPU round trips (`predict/predict_3D.py:100-114`);
    variables ride as jit arguments (see `make_apply_fn`).  With
    `normalise=True` the batch is raw (e.g. uint8) RGB and the detectron2
    pixel normalisation runs inside the jit — 4x less host->device
    transfer.  Binary masks leave the device bit-packed;
    `run_detector_batched` unpacks them back to bool transparently."""
    if normalise:
        from straps_tpu.perception.rcnn import normalise_image_device

        def one(v, img):
            return model.apply(v, normalise_image_device(img))
    else:
        def one(v, img):
            return model.apply(v, img)
    jitted = jax.jit(lambda v, b: _pack_mask_bits(
        jax.vmap(one, in_axes=(None, 0))(v, b)))
    return lambda batch: jitted(variables, batch)


def run_detector_batched(model, variables, images_rgb, test_size=None,
                         chunk: int = 8, apply_fn=None) -> dict:
    """Run a detector over a list of same-size images with floor(N/chunk)
    full-chunk jitted calls plus the N%chunk remainder at batch size 1
    (static shapes throughout: two compiled programs instead of padding the
    tail up to `chunk` — a 9-image folder runs 9 detector forwards at 800²,
    not 16, at the cost of one extra cached compile).  Returns the model's
    output dict with a leading image axis, pulled to host in one transfer
    per call.  Images ship to the device in their raw dtype (uint8 for real
    images); normalisation happens on device."""
    if apply_fn is None:
        apply_fn = make_batched_apply_fn(model, variables, normalise=True)
    n = len(images_rgb)
    inputs = np.stack([_resize_for_test(im, test_size)
                       for im in images_rgb])
    full = n - n % chunk
    outs = []
    for s in range(0, full, chunk):
        batch = jnp.asarray(inputs[s:s + chunk])
        outs.append(_unpack_mask_bits(jax.device_get(apply_fn(batch))))
    for i in range(full, n):
        batch = jnp.asarray(inputs[i:i + 1])
        outs.append(_unpack_mask_bits(jax.device_get(apply_fn(batch))))
    return {k: np.concatenate([o[k] for o in outs])[:n] for k in outs[0]}


def select_keypoints(out: dict, i: int, fw: int, fh: int) -> np.ndarray:
    """Per-image selection on batched detector outputs -> (17, 3) keypoints
    [x, y, score] (zeros when nobody was found — `predict_joints2D.py:45-52`)."""
    valid = np.asarray(out["valid"][i]).astype(bool)
    if not valid.any():
        return np.zeros((17, 3), np.float32)
    idx = get_largest_centred_box_index(out["boxes"][i], valid, fw, fh)
    kp = np.asarray(out["keypoints"][i][idx])
    ks = np.asarray(out["keypoint_scores"][i][idx])
    return np.concatenate([kp, ks[:, None]], axis=1)


def select_silhouette(out: dict, i: int):
    """Per-image selection on batched detector outputs -> ((H, W) float32
    silhouette, selected instance index or None)."""
    valid = np.asarray(out["valid"][i]).astype(bool)
    masks = np.asarray(out["masks"][i])
    mh, mw = masks.shape[-2:]
    if not valid.any():
        return np.zeros((mh, mw), np.float32), None
    idx = get_largest_centred_mask_index(masks, valid, mw, mh)
    return masks[idx].astype(np.float32), idx


def predict_joints2d(image_rgb: np.ndarray, model, variables,
                     apply_fn=None,
                     test_size=None) -> Tuple[np.ndarray, np.ndarray]:
    """Image -> (17, 3) keypoints [x, y, score] of the selected person
    (reference `predict_joints2D` contract: zeros if nobody found).
    When `test_size` is set the network runs at that resolution and the
    model's `output_size` maps outputs back to the input frame."""
    from straps_tpu.perception.rcnn import normalise_image
    # Boxes/keypoints come back in the model's `output_size` frame; with
    # output_size=0 they stay in the network-input frame, which is the
    # `test_size` square when set and the raw image otherwise.  Centred
    # selection must use that frame's dims.
    fw = fh = getattr(model, "output_size", 0) or test_size or 0
    if not fw:
        fh, fw = image_rgb.shape[:2]
    inp = jnp.asarray(normalise_image(_resize_for_test(image_rgb, test_size)))
    if apply_fn is None:
        apply_fn = make_apply_fn(model, variables)
    out = apply_fn(inp)
    valid = np.asarray(out["valid"])
    if not valid.any():
        return np.zeros((17, 3), np.float32), np.asarray(out["boxes"])
    idx = get_largest_centred_box_index(out["boxes"], valid, fw, fh)
    kp = np.asarray(out["keypoints"])[idx]
    ks = np.asarray(out["keypoint_scores"])[idx]
    return np.concatenate([kp, ks[:, None]], axis=1), np.asarray(out["boxes"])


def predict_silhouette(image_rgb: np.ndarray, model, variables,
                       apply_fn=None, test_size=None) -> np.ndarray:
    """Image -> (H, W) binary silhouette of the selected person (PointRend or
    DensePose model; both expose 'masks')."""
    from straps_tpu.perception.rcnn import normalise_image
    inp = jnp.asarray(normalise_image(_resize_for_test(image_rgb, test_size)))
    if apply_fn is None:
        apply_fn = make_apply_fn(model, variables)
    out = apply_fn(inp)
    valid = np.asarray(out["valid"])
    masks = np.asarray(out["masks"])
    # Masks are pasted in the model's `output_size` frame; return the
    # no-detection zeros in the SAME frame so batch stacking never mixes
    # shapes, and run centred selection with that frame's dims.
    mh, mw = masks.shape[-2:]
    if not valid.any():
        return np.zeros((mh, mw), np.float32)
    idx = get_largest_centred_mask_index(masks, valid, mw, mh)
    return masks[idx].astype(np.float32)
