"""Region Proposal Network: head + static-shape proposal generation.

Mirrors detectron2's StandardRPNHead + proposal selection (the reference's
detectors, SURVEY.md §2.4 #2), with the dynamic parts made static: per-level
top-k, fixed-size NMS, validity masks instead of variable-length tensors.
Single-image (no batch dim); vmap for batches.
"""

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from straps_tpu.perception.ops import (
    decode_boxes, clip_boxes, nms_fixed,
)


class RPNHead(nn.Module):
    num_anchors: int = 3
    channels: int = 256

    @nn.compact
    def __call__(self, features: List[jnp.ndarray]):
        conv = nn.Conv(self.channels, (3, 3), padding=1, name="conv")
        obj = nn.Conv(self.num_anchors, (1, 1), name="objectness")
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), name="anchor_deltas")
        logits, boxes = [], []
        for f in features:
            t = nn.relu(conv(f))
            logits.append(obj(t))
            boxes.append(deltas(t))
        return logits, boxes


def generate_proposals(logits: List[jnp.ndarray], deltas: List[jnp.ndarray],
                       anchors_per_level: List[np.ndarray], img_size: int,
                       pre_nms_topk: int = 1000, post_nms_topk: int = 1000,
                       nms_thresh: float = 0.7
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-image proposal generation.

    Args:
      logits: per level (H, W, A) objectness.
      deltas: per level (H, W, 4A).
    Returns:
      (post_nms_topk, 4) proposal boxes, (post_nms_topk,) scores,
      (post_nms_topk,) bool validity.
    """
    cand_boxes, cand_scores, cand_levels = [], [], []
    for lvl, (lg, dl, anch) in enumerate(zip(logits, deltas,
                                             anchors_per_level)):
        A = lg.shape[-1]
        scores = lg.reshape(-1)                          # (H*W*A,)
        # Trace-time guard: an anchor table sized by floor division while
        # the feature map came from ceil-of-SAME convs (e.g. P6 at 800²)
        # would decode every proposal against the wrong anchor, silently.
        assert scores.shape[0] == anch.shape[0], (
            f"level {lvl}: {scores.shape[0]} RPN predictions vs "
            f"{anch.shape[0]} anchors — anchor grid does not match the "
            f"feature map (pass feat_sizes to fpn_anchors)")
        d = dl.reshape(-1, 4)
        k = min(pre_nms_topk, scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(scores, k)
        boxes = decode_boxes(d[top_idx], jnp.asarray(anch)[top_idx])
        boxes = clip_boxes(boxes, img_size, img_size)
        cand_boxes.append(boxes)
        cand_scores.append(top_scores)
        cand_levels.append(jnp.full((k,), lvl, jnp.float32))
    all_boxes = jnp.concatenate(cand_boxes, axis=0)
    all_scores = jnp.concatenate(cand_scores, axis=0)
    all_levels = jnp.concatenate(cand_levels, axis=0)
    # Degenerate boxes are invalid.
    valid = ((all_boxes[:, 2] > all_boxes[:, 0]) &
             (all_boxes[:, 3] > all_boxes[:, 1]))
    all_scores = jnp.where(valid, all_scores, -jnp.inf)
    # detectron2 NMS-es each FPN level independently (batched_nms keyed by
    # level), then keeps the global top-k by score; offsetting each level's
    # boxes to a disjoint coordinate range makes one static NMS equivalent.
    offset = all_levels[:, None] * (2.0 * img_size + 2.0)
    keep_idx, keep_valid = nms_fixed(all_boxes + offset, all_scores,
                                     nms_thresh, post_nms_topk)
    safe = jnp.maximum(keep_idx, 0)
    return all_boxes[safe], all_scores[safe], keep_valid
