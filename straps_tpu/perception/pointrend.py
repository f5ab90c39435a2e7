"""PointRend instance-mask refinement (jittable, static point counts).

Mirrors the vendored PointRend the reference uses for silhouettes
(`PointRend/point_rend/` — coarse 7x7 mask head, StandardPointHead MLP with
per-layer coarse re-concat, and the inference subdivision loop: 5 steps of
2x upsample + re-predict the 28^2 most uncertain points,
`roi_heads.py:193-218`, `config.py:26-36`).  The subdivision trip count and
point counts are static, so the whole refinement unrolls inside jit; the
dynamic top-k uncertain-point selection is `jax.lax.top_k`.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from straps_tpu.perception.ops import bilinear_sample

SUBDIVISION_STEPS = 5
SUBDIVISION_POINTS = 28 * 28


class CoarseMaskHead(nn.Module):
    """14x14 ROI features -> 7x7 coarse mask logits
    (`PointRend/point_rend/coarse_mask_head.py:11-90` architecture:
    optional 1x1 channel-reduce conv — only created when in_channels >
    conv_dim, absent for the FPN-256ch PointRend checkpoints — 2x2 s2
    spatial-reduce conv, 2 FCs named `coarse_mask_fc*` like the d2 state
    dict, class-specific prediction).  The COCO PointRend checkpoint is
    80-class; person is class 0."""
    conv_dim: int = 256
    fc_dim: int = 1024
    num_classes: int = 80
    output_side: int = 7

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray) -> jnp.ndarray:
        R = roi_feats.shape[0]
        x = roi_feats
        if roi_feats.shape[-1] > self.conv_dim:
            x = nn.relu(nn.Conv(self.conv_dim, (1, 1),
                                name="reduce_channel_dim_conv")(x))
        x = nn.relu(nn.Conv(self.conv_dim, (2, 2), strides=(2, 2),
                            padding="VALID",
                            name="reduce_spatial_dim_conv")(x))
        # d2 flattens (C, H, W); NHWC flattens (H, W, C) — the checkpoint
        # converter permutes coarse_mask_fc1's input dim to match.
        x = x.reshape(R, -1)
        x = nn.relu(nn.Dense(self.fc_dim, name="coarse_mask_fc1")(x))
        x = nn.relu(nn.Dense(self.fc_dim, name="coarse_mask_fc2")(x))
        x = nn.Dense(self.num_classes * self.output_side ** 2,
                     name="prediction")(x)
        # torch views (R, K, S, S) row-major -> NHWC.
        x = x.reshape(R, self.num_classes, self.output_side, self.output_side)
        return jnp.transpose(x, (0, 2, 3, 1))


class PointHead(nn.Module):
    """MLP on per-point (fine features ++ coarse logits), coarse re-concat at
    every layer (`PointRend/point_rend/point_head.py:96-146`).  In d2 the
    layers are 1x1 conv1d; the converter folds them to Dense kernels."""
    fc_dim: int = 256
    num_layers: int = 3
    num_classes: int = 80

    @nn.compact
    def __call__(self, fine: jnp.ndarray, coarse: jnp.ndarray) -> jnp.ndarray:
        """fine: (R, P, Cf); coarse: (R, P, K) -> (R, P, K) logits."""
        x = jnp.concatenate([fine, coarse], axis=-1)
        for i in range(self.num_layers):
            x = nn.relu(nn.Dense(self.fc_dim, name=f"fc{i + 1}")(x))
            x = jnp.concatenate([x, coarse], axis=-1)
        return nn.Dense(self.num_classes, name="predictor")(x)


def uncertainty(logits: jnp.ndarray) -> jnp.ndarray:
    """-|logit|: closest to the 0.5 decision boundary = most uncertain
    (`PointRend/point_rend/roi_heads.py:26-48`)."""
    return -jnp.abs(logits)


def sample_mask_at_points(mask: jnp.ndarray, points01: jnp.ndarray
                          ) -> jnp.ndarray:
    """Bilinearly sample (S, S, K) mask logits at (P, 2) normalised [0, 1]
    box coords (grid_sample align_corners=False convention)."""
    S = mask.shape[0]
    x = points01[:, 0] * S - 0.5
    y = points01[:, 1] * S - 0.5
    return bilinear_sample(mask, x, y)


def sample_fine_features(p2: jnp.ndarray, box: jnp.ndarray,
                         points01: jnp.ndarray, stride: float = 4.0
                         ) -> jnp.ndarray:
    """Sample backbone P2 features at box-normalised points
    (`point_features.py:145-188` fine-grained feature sampling)."""
    x_img = box[0] + points01[:, 0] * (box[2] - box[0])
    y_img = box[1] + points01[:, 1] * (box[3] - box[1])
    return bilinear_sample(p2, x_img / stride - 0.5, y_img / stride - 0.5)


def subdivision_inference(point_head_apply, coarse_logits: jnp.ndarray,
                          p2: jnp.ndarray, boxes: jnp.ndarray,
                          steps: int = SUBDIVISION_STEPS,
                          num_points: int = SUBDIVISION_POINTS,
                          channel: int = None) -> jnp.ndarray:
    """Iterative subdivision mask refinement, static trip count.

    Args:
      point_head_apply: fn(fine (R,P,C), coarse (R,P,K)) -> (R,P,K).
      coarse_logits: (R, 7, 7, K).
      p2: (H, W, C) finest backbone level.
      boxes: (R, 4) xyxy image coords.
      channel: if set, the refined GRID carries only this class channel
        (the MLP still sees the full K-channel coarse logits at each
        point, so the per-point math is identical) — the K=80 COCO grid
        is otherwise resized/scattered 80x wider than the one channel
        the silhouette path consumes, and the grid resizes dominate the
        whole PointRend tail.  For `channel=0` the output is bit-identical
        to the all-channel run (asserted by test).  For other channels the
        refinement points score the SELECTED channel's uncertainty —
        detectron2's per-predicted-class behaviour
        (`point_rend/roi_heads.py:193-218`) — whereas the all-channel run
        here always scores channel 0, so the two runs refine different
        points for `channel != 0`.
    Returns:
      (R, 7*2**steps, 7*2**steps, K) refined mask logits — K=1 (the
      selected channel) when `channel` is set.
    """
    R, S, _, K = coarse_logits.shape
    ksel = (slice(None) if channel is None
            else slice(channel, channel + 1))
    mask = coarse_logits[..., ksel]
    Kg = mask.shape[-1]

    for _ in range(steps):
        S = S * 2
        mask = jax.image.resize(mask, (R, S, S, Kg), method="bilinear")
        unc = uncertainty(mask[..., 0]).reshape(R, S * S)
        k = min(num_points, S * S)  # early steps have fewer grid points
        _, idx = jax.lax.top_k(unc, k)                      # (R, P)
        py = (idx // S).astype(jnp.float32)
        px = (idx % S).astype(jnp.float32)
        pts01 = jnp.stack([(px + 0.5) / S, (py + 0.5) / S], axis=-1)

        def per_roi(mask_r, pts_r, box_r, coarse_r):
            fine = sample_fine_features(p2, box_r, pts_r)
            coarse_pt = sample_mask_at_points(coarse_r, pts_r)
            return fine, coarse_pt

        fine, coarse_pt = jax.vmap(per_roi)(mask, pts01, boxes, coarse_logits)
        new_logits = point_head_apply(fine, coarse_pt)      # (R, P, K)
        flat = mask.reshape(R, S * S, Kg)
        flat = jax.vmap(lambda m, i, v: m.at[i].set(v))(
            flat, idx, new_logits[..., ksel])
        mask = flat.reshape(R, S, S, Kg)
    return mask


def importance_sample_points(key, coarse_logits: jnp.ndarray,
                             num_points: int = 14 * 14,
                             oversample_ratio: float = 3.0,
                             importance_sample_ratio: float = 0.75
                             ) -> jnp.ndarray:
    """Train-time point selection: oversample random points, keep the most
    uncertain `importance_sample_ratio` fraction, fill the rest uniformly
    (`PointRend/point_rend/point_features.py:63-115` semantics with the
    default config 14^2 points, oversample 3, importance 0.75).

    Args:
      coarse_logits: (R, S, S, K) coarse mask predictions.
    Returns:
      (R, num_points, 2) point coords in [0, 1] box space.
    """
    R, S = coarse_logits.shape[0], coarse_logits.shape[1]
    n_sampled = int(num_points * oversample_ratio)
    k1, k2 = jax.random.split(key)
    pts = jax.random.uniform(k1, (R, n_sampled, 2))
    unc = jax.vmap(lambda c, p: uncertainty(
        sample_mask_at_points(c, p)[..., 0]))(coarse_logits, pts)
    n_unc = int(importance_sample_ratio * num_points)
    _, idx = jax.lax.top_k(unc, n_unc)                       # (R, n_unc)
    chosen = jnp.take_along_axis(pts, idx[..., None], axis=1)
    n_rand = num_points - n_unc
    rand = jax.random.uniform(k2, (R, n_rand, 2))
    return jnp.concatenate([chosen, rand], axis=1)


def mask_point_loss(point_logits: jnp.ndarray, gt_masks01: jnp.ndarray,
                    points01: jnp.ndarray) -> jnp.ndarray:
    """BCE between point predictions and GT mask values sampled at the same
    points (`PointRend/point_rend/point_head.py:22-93`).

    Args:
      point_logits: (R, P, 1); gt_masks01: (R, S, S) binary; points01:
        (R, P, 2) in [0, 1] box space.
    """
    gt = jax.vmap(lambda m, p: sample_mask_at_points(m[..., None], p)[..., 0]
                  )(gt_masks01, points01)
    logits = point_logits[..., 0]
    loss = jnp.maximum(logits, 0) - logits * gt + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def _paste_axis_weights(coord: jnp.ndarray, S: int) -> jnp.ndarray:
    """(N,) continuous sample coords -> (N, S) dense bilinear tap rows
    (taps outside [0, S) contribute zero, matching `bilinear_sample`).
    Offset-free single-extent case of `ops.bilinear_axis_rows`."""
    from straps_tpu.perception.ops import bilinear_axis_rows

    return bilinear_axis_rows(coord[None, :],
                              jnp.full((1,), S, jnp.int32), S)[0]


def paste_mask(mask_logits: jnp.ndarray, box: jnp.ndarray, img_h: int,
               img_w: int, threshold: float = 0.5) -> jnp.ndarray:
    """Paste one (S, S) mask into the full image at `box` (bilinear), then
    threshold — detectron2's paste_masks_in_image equivalent (sigmoid is
    applied BEFORE interpolation, like mask_rcnn_inference + grid_sample).

    The bilinear resample grid is separable in x and y, so the paste runs
    as two matmuls against dense per-axis tap rows (`Ry @ probs @ Rx^T`)
    instead of img_h*img_w point gathers — the gathers were a dominant
    cost of the mask tail at 512²x8 detections.  `precision="highest"`
    keeps the result float-exact vs the gather formulation (the output is
    thresholded at 0.5, where default-precision matmul error could flip
    boundary pixels)."""
    S = mask_logits.shape[0]
    ys = jnp.arange(img_h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(img_w, dtype=jnp.float32) + 0.5
    u = (xs - box[0]) / jnp.maximum(box[2] - box[0], 1e-6)   # (img_w,)
    v = (ys - box[1]) / jnp.maximum(box[3] - box[1], 1e-6)   # (img_h,)
    ry = _paste_axis_weights(v * S - 0.5, S)                 # (img_h, S)
    rx = _paste_axis_weights(u * S - 0.5, S)                 # (img_w, S)
    probs01 = jax.nn.sigmoid(mask_logits)
    vals = jnp.einsum("ys,st,xt->yx", ry, probs01, rx,
                      precision=jax.lax.Precision.HIGHEST)
    inside = ((u >= 0) & (u < 1))[None, :] & ((v >= 0) & (v < 1))[:, None]
    return ((vals * inside) > threshold).astype(jnp.float32)
