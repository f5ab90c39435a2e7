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
