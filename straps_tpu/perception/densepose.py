"""DensePose head: per-ROI IUV prediction.

Mirrors the vendored DensePose heads the reference can use for silhouettes
(`DensePose/densepose/densepose_head.py`): the V1ConvX head (8 x conv3x3,
512 ch, `:271-301`) and the predictor's four deconv branches — coarse seg
S (2 ch for NUM_CLASSES=1... 15 ch for the chart-based model), patch index
I (25 ch), and U/V charts (25 ch each) — each deconv 4x4 s2 + 2x bilinear
(`:304-345`).  STRAPS only consumes the I channel as a binary silhouette
(`predict/predict_densepose.py` + `utils/label_conversions.py:39-46`), so
inference here reduces IUV to a person mask.
"""

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

NUM_PATCHES = 24
NUM_COARSE_SEG = 15


class DensePoseHead(nn.Module):
    """V1ConvX: 8 x conv3x3(512) on (R, 14, 14, C) ROI features
    (POOLER_RESOLUTION=14, `DensePose/densepose/config.py:26`)."""
    conv_dim: int = 512
    num_convs: int = 8

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray) -> jnp.ndarray:
        x = roi_feats
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_dim, (3, 3), padding=1,
                                name=f"body_conv_fcn{i + 1}")(x))
        return x


class DensePosePredictor(nn.Module):
    """Four deconv branches (S/I/U/V) + 2x bilinear upsample."""

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        def branch(ch, name):
            # kernel 4 stride 2 "SAME" = exact 2x (torch k4/s2/p1 sizes)
            y = nn.ConvTranspose(ch, (4, 4), strides=(2, 2),
                                 padding="SAME", name=name)(x)
            R, H, W, C = y.shape
            return jax.image.resize(y, (R, H * 2, W * 2, C), "bilinear")

        s = branch(NUM_COARSE_SEG, "ann_index_lowres")
        i = branch(NUM_PATCHES + 1, "index_uv_lowres")
        u = branch(NUM_PATCHES + 1, "u_lowres")
        v = branch(NUM_PATCHES + 1, "v_lowres")
        return s, i, u, v


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (the DeepLab variant's core,
    `DensePose/densepose/densepose_head.py:89-145`): conv1x1 + three atrous
    branches + an image-level pooling branch, each conv bias-free with a
    GroupNorm(32), then a bias-free 1x1 projection with NO norm (the
    reference comments its project BatchNorm out).  GroupNorms carry
    explicit names so `convert_d2` can address them."""
    out_dim: int = 512
    rates: tuple = (6, 12, 56)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        R, H, W, _ = x.shape
        branches = [nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-5, name="gn1x1")(
            nn.Conv(self.out_dim, (1, 1), use_bias=False,
                    name="conv1x1")(x)))]
        for k, rate in enumerate(self.rates):
            b = nn.Conv(self.out_dim, (3, 3), kernel_dilation=(rate, rate),
                        padding=rate, use_bias=False,
                        name=f"atrous{k + 1}")(x)
            branches.append(nn.relu(
                nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"gn_atrous{k + 1}")(b)))
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-5, name="gn_pool")(
            nn.Conv(self.out_dim, (1, 1), use_bias=False,
                    name="pool_conv")(pooled)))
        branches.append(jnp.broadcast_to(pooled, (R, H, W, self.out_dim)))
        cat = jnp.concatenate(branches, axis=-1)
        return nn.relu(nn.Conv(self.out_dim, (1, 1), use_bias=False,
                               name="project")(cat))


class NonLocalBlock2D(nn.Module):
    """Self-attention over spatial positions (the DeepLab head's optional
    NonLocal block, `DensePose/densepose/densepose_head.py:150-268`):
    theta/phi/g 1x1 projections, softmax(theta.phi^T).g, output projection
    (+GroupNorm) with a residual.  `sub_sample` maxpools phi/g 2x like the
    reference.  Batched matmuls land on the MXU."""
    in_channels: int = 512
    inter_channels: int = 256
    sub_sample: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        R, H, W, C = x.shape
        theta = nn.Conv(self.inter_channels, (1, 1), name="theta")(x)
        phi = nn.Conv(self.inter_channels, (1, 1), name="phi")(x)
        g = nn.Conv(self.inter_channels, (1, 1), name="g")(x)
        if self.sub_sample:
            phi = nn.max_pool(phi, (2, 2), strides=(2, 2))
            g = nn.max_pool(g, (2, 2), strides=(2, 2))
        q = theta.reshape(R, H * W, self.inter_channels)
        k = phi.reshape(R, -1, self.inter_channels)
        v = g.reshape(R, -1, self.inter_channels)
        # precision="highest": converted-checkpoint parity path — default
        # TPU matmul precision is bf16-ish (CLAUDE.md rodrigues bug class).
        attn = jax.nn.softmax(
            jnp.einsum("rqc,rkc->rqk", q, k,
                       precision=jax.lax.Precision.HIGHEST), axis=-1)
        y = jnp.einsum("rqk,rkc->rqc", attn, v,
                       precision=jax.lax.Precision.HIGHEST).reshape(
            R, H, W, self.inter_channels)
        # Reference zero-inits the output GroupNorm's scale AND bias
        # (densepose_head.py:201-202) so the block starts as identity.
        w_y = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="gn_w",
                           scale_init=nn.initializers.zeros)(
            nn.Conv(self.in_channels, (1, 1), name="W")(y))
        return x + w_y


def densepose_data_filter(proposal_boxes: jnp.ndarray,
                          gt_boxes: jnp.ndarray,
                          has_densepose: jnp.ndarray,
                          valid: jnp.ndarray,
                          iou_threshold: float = 0.7) -> jnp.ndarray:
    """Static-shape `DensePoseDataFilter` (`densepose_head.py:348-385`):
    keep proposals whose matched-GT IoU exceeds FG_IOU_THRESHOLD (0.7,
    `DensePose/densepose/config.py`) AND that carry a DensePose annotation.
    Returns a (R,) bool keep-mask instead of the reference's list surgery
    (downstream losses mask by it)."""
    from straps_tpu.perception.ops import box_area

    lt = jnp.maximum(proposal_boxes[:, :2], gt_boxes[:, :2])
    rb = jnp.minimum(proposal_boxes[:, 2:], gt_boxes[:, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    union = box_area(proposal_boxes) + box_area(gt_boxes) - inter
    iou = inter / jnp.maximum(union, 1e-9)
    return (iou > iou_threshold) & has_densepose & valid


def iuv_to_uint8_image(part: "np.ndarray", u: "np.ndarray",
                       v: "np.ndarray") -> "np.ndarray":
    """(S, S) part/u/v maps -> the reference's per-box uint8 IUV image
    (`DensePose/densepose/structures.py:355-455` DensePoseResult payload:
    channel 0 = part index, channels 1/2 = U/V scaled to [0, 255])."""
    import numpy as np
    return np.stack([
        np.asarray(part).astype(np.uint8),
        np.clip(np.asarray(u) * 255.0, 0, 255).astype(np.uint8),
        np.clip(np.asarray(v) * 255.0, 0, 255).astype(np.uint8),
    ], axis=-1)


class DensePoseDeepLabHead(nn.Module):
    """DeepLab-style head: ASPP + stacked GN convs (NUM_STACKED_CONVS=8,
    `DensePose/densepose/config.py:17`), with the reference's optional
    NonLocal block (off by default — DEEPLAB.NONLOCAL_ON).  Stacked convs
    are bias-free with a named GroupNorm, matching d2's Conv2d(norm=GN,
    bias=not norm) so checkpoints convert 1:1."""
    conv_dim: int = 512
    num_convs: int = 8
    use_nonlocal: bool = False

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray) -> jnp.ndarray:
        # Reference wiring (`densepose_head.py:38-44`): ASPP keeps the ROI
        # feature width (out = input_channels) and NL runs at that width;
        # only the stacked convs map to CONV_HEAD_DIM.
        C = roi_feats.shape[-1]
        x = ASPP(out_dim=C, name="aspp")(roi_feats)
        if self.use_nonlocal:
            x = NonLocalBlock2D(in_channels=C, inter_channels=C // 2,
                                name="nonlocal")(x)
        for i in range(self.num_convs):
            x = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"gn{i + 1}")(
                nn.Conv(self.conv_dim, (3, 3), padding=1, use_bias=False,
                        name=f"body_conv_fcn{i + 1}")(x)))
        return x


def _sample_at_points(maps: jnp.ndarray, points01: jnp.ndarray) -> jnp.ndarray:
    """Bilinear (R, S, S, C) at (R, P, 2) box-normalised points."""
    from straps_tpu.perception.ops import bilinear_sample

    def one(m, p):
        S = m.shape[0]
        return bilinear_sample(m, p[:, 0] * S - 0.5, p[:, 1] * S - 0.5)

    import jax as _jax
    return _jax.vmap(one)(maps, points01)


def densepose_losses(s: jnp.ndarray, i: jnp.ndarray, u: jnp.ndarray,
                     v: jnp.ndarray, gt_segm: jnp.ndarray,
                     gt_points01: jnp.ndarray, gt_part: jnp.ndarray,
                     gt_u: jnp.ndarray, gt_v: jnp.ndarray,
                     point_valid: jnp.ndarray,
                     w_points: float = 0.1, w_part: float = 0.3,
                     w_segm: float = 2.0) -> dict:
    """DensePose training losses (`densepose_head.py:752-873` semantics):
    full-grid CE on the coarse segmentation, point-interpolated CE on the
    patch index, point-interpolated smooth-L1 on U/V of the GT patch; loss
    weights from `DensePose/densepose/config.py:32-36`.

    Args:
      s: (R, S, S, 15); i/u/v: (R, S, S, 25).
      gt_segm: (R, S, S) int coarse seg labels.
      gt_points01: (R, P, 2) annotated points (box space, [0,1]).
      gt_part: (R, P) int patch index; gt_u/gt_v: (R, P) in [0,1].
      point_valid: (R, P) bool annotation mask.
    """
    import jax as _jax

    logp_s = _jax.nn.log_softmax(s, axis=-1)
    onehot_s = _jax.nn.one_hot(gt_segm, s.shape[-1], dtype=s.dtype)
    loss_segm = -jnp.mean(jnp.sum(onehot_s * logp_s, axis=-1))

    i_pts = _sample_at_points(i, gt_points01)             # (R, P, 25)
    logp_i = _jax.nn.log_softmax(i_pts, axis=-1)
    onehot_i = _jax.nn.one_hot(gt_part, i.shape[-1], dtype=i.dtype)
    pv = point_valid.astype(i.dtype)
    denom = jnp.maximum(jnp.sum(pv), 1.0)
    loss_part = -jnp.sum(jnp.sum(onehot_i * logp_i, axis=-1) * pv) / denom

    def smooth_l1(pred, gt):
        d = jnp.abs(pred - gt)
        return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)

    u_pts = _sample_at_points(u, gt_points01)
    v_pts = _sample_at_points(v, gt_points01)
    take = _jax.nn.one_hot(gt_part, u.shape[-1], dtype=u.dtype)
    u_sel = jnp.sum(u_pts * take, axis=-1)
    v_sel = jnp.sum(v_pts * take, axis=-1)
    loss_u = jnp.sum(smooth_l1(u_sel, gt_u) * pv) / denom
    loss_v = jnp.sum(smooth_l1(v_sel, gt_v) * pv) / denom

    total = (w_segm * loss_segm + w_part * loss_part
             + w_points * (loss_u + loss_v))
    return {"total": total, "segm": loss_segm, "part": loss_part,
            "u": loss_u, "v": loss_v}


def densepose_result_uint8(s_logits: "np.ndarray", i_logits: "np.ndarray",
                           u_logits: "np.ndarray", v_logits: "np.ndarray",
                           box_xyxy: "np.ndarray") -> "np.ndarray":
    """Host-side reference-exact DensePoseResult payload for one detection
    (`DensePose/densepose/structures.py:374-401`): bilinear-resize the
    (56, 56, C) S/I/U/V grids to the int box size (``max(int(wh), 1)``),
    I = argmax AFTER resizing gated by the resized coarse foreground, U/V
    selected per part id, scaled by 255, clamped and truncated to uint8.
    Returns the (h, w, 3) uint8 (I, U, V) image `encode_iuv_png` packs onto
    the wire.  numpy mirrors torch's nested-lerp evaluation order so values
    match F.interpolate up to assoc-free bit identity."""
    import numpy as np

    x1, y1, x2, y2 = [float(c) for c in np.asarray(box_xyxy)]
    w = max(int(x2 - x1), 1)
    h = max(int(y2 - y1), 1)

    def resize(grid):
        S = grid.shape[0]

        def coords(n):
            x = ((np.arange(n, dtype=np.float32) + 0.5)
                 * np.float32(S / n) - 0.5)
            x = np.maximum(x, 0)
            i0 = np.minimum(np.floor(x).astype(np.int64), S - 1)
            lam = (x - i0).astype(np.float32)
            return i0, np.minimum(i0 + 1, S - 1), lam

        r0, r1, ly = coords(h)
        c0, c1, lx = coords(w)
        g = np.asarray(grid, np.float32)
        v00, v01 = g[np.ix_(r0, c0)], g[np.ix_(r0, c1)]
        v10, v11 = g[np.ix_(r1, c0)], g[np.ix_(r1, c1)]
        lx_, ly_ = lx[None, :, None], ly[:, None, None]
        return ((1 - ly_) * ((1 - lx_) * v00 + lx_ * v01)
                + ly_ * ((1 - lx_) * v10 + lx_ * v11))

    s_b, i_b = resize(np.asarray(s_logits)), resize(np.asarray(i_logits))
    u_b, v_b = resize(np.asarray(u_logits)), resize(np.asarray(v_logits))
    part = i_b.argmax(-1) * (s_b.argmax(-1) > 0)
    take = part[..., None] == np.arange(u_b.shape[-1])[None, None, :]
    u_sel = (u_b * take).sum(-1)
    v_sel = (v_b * take).sum(-1)
    out = np.zeros((h, w, 3), np.uint8)
    out[..., 0] = part.astype(np.uint8)
    nz = part > 0
    out[..., 1][nz] = np.clip(u_sel[nz] * 255.0, 0, 255).astype(np.uint8)
    out[..., 2][nz] = np.clip(v_sel[nz] * 255.0, 0, 255).astype(np.uint8)
    return out


def encode_iuv_png(iuv_uint8: "np.ndarray") -> str:
    """Pack a per-box (H, W, 3) uint8 IUV image as base64 PNG — the wire
    format of `DensePose/densepose/structures.py:355-455` results."""
    import base64
    import io

    import numpy as np
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.asarray(iuv_uint8, np.uint8)).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def decode_iuv_png(data: str) -> "np.ndarray":
    """Inverse of `encode_iuv_png`."""
    import base64
    import io

    import numpy as np
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(base64.b64decode(data))))


def _interp_axis_rows(i_local: jnp.ndarray, n_box: jnp.ndarray,
                      src: int) -> jnp.ndarray:
    """(N,) box-local integer pixel indices -> (N, src) bilinear tap rows of
    torch ``F.interpolate(mode="bilinear", align_corners=False)`` resizing a
    `src`-sample axis to `n_box` samples (a traced int scalar), including
    torch's source-index handling: negative source coords clamp to 0, and at
    the top edge the second tap is pinned to `src - 1` (h1p=0), so every
    in-range row's taps sum to ~1.  Rows whose box-local index falls outside
    [0, n_box) are zeroed — downstream channel scores there are exactly 0."""
    x = ((i_local.astype(jnp.float32) + 0.5)
         * (src / n_box.astype(jnp.float32)) - 0.5)
    x = jnp.maximum(x, 0.0)
    i0 = jnp.minimum(jnp.floor(x).astype(jnp.int32), src - 1)
    lam = x - i0.astype(jnp.float32)
    i1 = jnp.minimum(i0 + 1, src - 1)
    rows = (jax.nn.one_hot(i0, src) * (1.0 - lam)[:, None]
            + jax.nn.one_hot(i1, src) * lam[:, None])
    valid = (i_local >= 0) & (i_local < n_box)
    return rows * valid[:, None].astype(jnp.float32)


def paste_densepose_labels(s_logits: jnp.ndarray, i_logits: jnp.ndarray,
                           box_xyxy: jnp.ndarray, out_h: int,
                           out_w: int) -> jnp.ndarray:
    """Reference-exact DensePose label paste into the image frame.

    `DensePose/densepose/structures.py:374-401` resizes the (56, 56) S and I
    logit grids bilinearly to the INT box size (``max(int(w), 1)``), argmaxes
    AFTER resizing (part gated by the resized coarse foreground), and
    `predict/predict_densepose.py:95-101` pastes the resulting label map at
    the int-truncated box origin.  Frame pixel (y, x) inside the box IS box
    pixel (y - int(y1), x - int(x1)), so resize-to-box + paste collapses into
    two separable weight matmuls per channel (the `paste_mask` trick) over a
    static frame grid — jittable, no dynamic shapes.  Outside the box every
    tap row is zero, all channel scores are exactly 0, and both argmaxes land
    on background deterministically.

    Returns the (out_h, out_w) int32 part-label map (0 = background)."""
    src = s_logits.shape[0]
    x0 = jnp.trunc(box_xyxy[0]).astype(jnp.int32)
    y0 = jnp.trunc(box_xyxy[1]).astype(jnp.int32)
    # max(int(w), 1): structures.py:375-377 (int() == trunc; detections are
    # frame-clipped so coords are non-negative and floor == trunc).
    wi = jnp.maximum(
        jnp.trunc(box_xyxy[2] - box_xyxy[0]).astype(jnp.int32), 1)
    hi = jnp.maximum(
        jnp.trunc(box_xyxy[3] - box_xyxy[1]).astype(jnp.int32), 1)
    ry = _interp_axis_rows(jnp.arange(out_h, dtype=jnp.int32) - y0, hi, src)
    rx = _interp_axis_rows(jnp.arange(out_w, dtype=jnp.int32) - x0, wi, src)
    si = jnp.concatenate([s_logits, i_logits], axis=-1).astype(jnp.float32)
    # HIGHEST precision: the output is an argmax over resampled channels,
    # where default-precision matmul error could flip labels at part
    # boundaries (same rationale as `paste_mask`).
    vals = jnp.einsum("ys,stc,xt->yxc", ry, si, rx,
                      precision=jax.lax.Precision.HIGHEST)
    ns = s_logits.shape[-1]
    fg = jnp.argmax(vals[..., :ns], axis=-1) > 0
    part = jnp.argmax(vals[..., ns:], axis=-1)
    return jnp.where(fg, part, 0).astype(jnp.int32)


def densepose_to_iuv(s: jnp.ndarray, i: jnp.ndarray, u: jnp.ndarray,
                     v: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray,
                                              jnp.ndarray]:
    """Per-ROI logits -> (I part index map, U, V) like
    `DensePose/densepose/densepose_head.py:403-437`: I = argmax over patch
    channels gated by the coarse segmentation foreground."""
    fg = jnp.argmax(s, axis=-1) > 0                         # (R, S, S)
    part = jnp.argmax(i, axis=-1)                           # (R, S, S)
    part = jnp.where(fg, part, 0)
    take = jax.nn.one_hot(part, u.shape[-1], dtype=u.dtype)
    u_sel = jnp.sum(u * take, axis=-1)
    v_sel = jnp.sum(v * take, axis=-1)
    return part, u_sel, v_sel
