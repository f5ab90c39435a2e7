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
    """V1ConvX: 8 x conv3x3(512) on (R, 28, 28, C) ROI features."""
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
    """Atrous spatial pyramid pooling with GroupNorm (the DeepLab variant's
    core, `DensePose/densepose/densepose_head.py:150-268`: rates (6, 12, 56)
    + image-level pooling branch)."""
    out_dim: int = 512
    rates: tuple = (6, 12, 56)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        R, H, W, _ = x.shape
        branches = [nn.relu(nn.GroupNorm(num_groups=32)(
            nn.Conv(self.out_dim, (1, 1), name="conv1x1")(x)))]
        for k, rate in enumerate(self.rates):
            b = nn.Conv(self.out_dim, (3, 3), kernel_dilation=(rate, rate),
                        padding=rate, name=f"atrous{k + 1}")(x)
            branches.append(nn.relu(nn.GroupNorm(num_groups=32)(b)))
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = nn.relu(nn.Conv(self.out_dim, (1, 1), name="pool_conv")(pooled))
        branches.append(jnp.broadcast_to(pooled, (R, H, W, self.out_dim)))
        cat = jnp.concatenate(branches, axis=-1)
        return nn.relu(nn.GroupNorm(num_groups=32)(
            nn.Conv(self.out_dim, (1, 1), name="project")(cat)))


class DensePoseDeepLabHead(nn.Module):
    """DeepLab-style head: ASPP + GN convs (NonLocal block optional in the
    reference, off by default — `DensePose/densepose/config.py`)."""
    conv_dim: int = 512
    num_convs: int = 2

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray) -> jnp.ndarray:
        x = ASPP(out_dim=self.conv_dim, name="aspp")(roi_feats)
        for i in range(self.num_convs):
            x = nn.relu(nn.GroupNorm(num_groups=32)(
                nn.Conv(self.conv_dim, (3, 3), padding=1,
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
