"""Stage-level TPU timings for the detector path at the real 800^2 test
size: backbone+FPN, RPN head, proposal selection (top-k + blocked NMS),
multilevel ROIAlign (box 7^2 / keypoint 14^2), box head, keypoint head.

Each stage is timed as its own jit with representative input shapes, so the
per-image cost split of the ~0.8s keypoint_rcnn forward is attributable.

Usage: python benchmarks/perception_profile.py [img_size] [backbone_dtype]

`backbone_dtype=bfloat16` profiles the opt-in MXU stack: bf16 backbone
convs + bf16 einsum ROIAlign (heads/NMS f32), the dtype split
`KeypointRCNN(backbone_dtype='bfloat16')` runs.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    img = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    bdt = sys.argv[2] if len(sys.argv) > 2 else None

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from straps_tpu.perception.anchors import fpn_anchors
    from straps_tpu.perception.fpn import ResNet50FPN, FPN_STRIDES
    from straps_tpu.perception.heads import (
        BoxHead, KeypointHead, box_inference, pooled_box_features,
    )
    from straps_tpu.perception.rpn import RPNHead, generate_proposals

    rng = np.random.RandomState(0)

    def timeit(fn, *args, n=10):
        # Host-pull completion barrier (CLAUDE.md), but pull ONE element
        # sliced ON DEVICE: np.asarray(full_leaf) would ship the whole
        # array over the ~24 MB/s tunnel inside the timed window (~1.7 s
        # for an 800^2 backbone map), inflating every stage by transfer/n.
        def barrier(out):
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        barrier(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        barrier(out)
        return (time.perf_counter() - t0) / n * 1e3

    image = jnp.asarray(rng.uniform(-2, 2, (1, img, img, 3)).astype(np.float32))
    bb = ResNet50FPN(depth=50, compute_dtype=bdt)
    bb_vars = bb.init(jax.random.PRNGKey(0), image)
    bb_fn = jax.jit(lambda v, x: bb.apply(v, x))
    t = timeit(bb_fn, bb_vars, image)
    tag = f"R50{'/bf16' if bdt else ''}, {img}^2"
    print(f"backbone+FPN ({tag})      {t:7.1f} ms", flush=True)

    feats = [f[0] for f in bb_fn(bb_vars, image)]
    rpn = RPNHead()
    rpn_vars = rpn.init(jax.random.PRNGKey(1), feats)
    rpn_fn = jax.jit(lambda v, f: rpn.apply(v, f))
    t = timeit(rpn_fn, rpn_vars, feats)
    print(f"RPN head (5 levels)                {t:7.1f} ms", flush=True)

    logits, deltas = rpn_fn(rpn_vars, feats)
    anchors = fpn_anchors(img, FPN_STRIDES)
    prop_fn = jax.jit(lambda lg, dl: generate_proposals(
        lg, dl, anchors, img, post_nms_topk=512))
    t = timeit(prop_fn, logits, deltas)
    print(f"proposal select (topk+NMS)         {t:7.1f} ms", flush=True)

    proposals, _, _ = prop_fn(logits, deltas)
    roi7_fn = jax.jit(lambda f, b: pooled_box_features(
        f, b, 7, compute_dtype=bdt))
    t = timeit(roi7_fn, feats, proposals)
    print(f"multilevel ROIAlign 7^2 x512       {t:7.1f} ms", flush=True)

    roi = roi7_fn(feats, proposals)
    bh = BoxHead(num_classes=1)
    bh_vars = bh.init(jax.random.PRNGKey(2), roi)
    bh_fn = jax.jit(lambda v, r: bh.apply(v, r))
    t = timeit(bh_fn, bh_vars, roi)
    print(f"box head (2 FC + predictors)       {t:7.1f} ms", flush=True)

    scores, box_deltas = bh_fn(bh_vars, roi)
    det_fn = jax.jit(lambda s, d, p: box_inference(
        s, d, p, jnp.ones(p.shape[0], bool), img, max_detections=8))
    t = timeit(det_fn, scores, box_deltas, proposals)
    print(f"box inference (thresh+NMS+topk)    {t:7.1f} ms", flush=True)

    det_boxes, _, _ = det_fn(scores, box_deltas, proposals)
    roi14_fn = jax.jit(lambda f, b: pooled_box_features(
        f, b, 14, compute_dtype=bdt))
    t = timeit(roi14_fn, feats, det_boxes)
    print(f"multilevel ROIAlign 14^2 x8        {t:7.1f} ms", flush=True)

    kp_roi = roi14_fn(feats, det_boxes)
    kh = KeypointHead()
    kh_vars = kh.init(jax.random.PRNGKey(3), kp_roi)
    kh_fn = jax.jit(lambda v, r: kh.apply(v, r))
    t = timeit(kh_fn, kh_vars, kp_roi)
    print(f"keypoint head (8 dets)             {t:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
