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

    def test_keypoints_inside_boxes(self, kp_model_and_vars):
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
            assert np.all(kps[d, :, 0] >= boxes[d, 0] - 1e-3)
            assert np.all(kps[d, :, 0] <= boxes[d, 2] + 1e-3)
            assert np.all(kps[d, :, 1] >= boxes[d, 1] - 1e-3)
            assert np.all(kps[d, :, 1] <= boxes[d, 3] + 1e-3)


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
        assert out["part_index"].shape == (2, 112, 112)
        assert int(np.asarray(out["part_index"]).max()) <= 24
        assert out["masks"].shape == (2, IMG, IMG)


def _flax_to_d2_names(variables):
    """Test-side inverse of convert_d2_state's name mapping."""
    out = {}

    def emit(coll, path, v):
        mods, leaf = path[:-1], path[-1]
        v = np.asarray(v)
        # module path -> d2 name
        if mods[0] == "trunk":
            sub = mods[1:]
            if sub[0] == "backbone":
                if sub[1] == "bottom_up":
                    m = sub[2]
                    if m == "conv1":
                        d2 = "backbone.bottom_up.stem.conv1"
                    elif m == "bn1":
                        d2 = "backbone.bottom_up.stem.conv1.norm"
                    else:  # layer{s}_{b}
                        stage, block = m.rsplit("_", 1)
                        res = f"res{int(stage[5:]) + 1}"
                        inner = sub[3]
                        if inner == "downsample_conv":
                            inner = "shortcut"
                        elif inner == "downsample_bn":
                            inner = "shortcut.norm"
                        elif inner.startswith("bn"):
                            inner = f"conv{inner[-1]}.norm"
                        d2 = f"backbone.bottom_up.{res}.{block}.{inner}"
                else:  # fpn
                    m = sub[2]
                    kind = "lateral" if m.startswith("lateral") else "output"
                    d2 = f"backbone.fpn_{kind}{m[-1]}"
            elif sub[0] == "rpn_head":
                name = {"conv": "conv", "objectness": "objectness_logits",
                        "anchor_deltas": "anchor_deltas"}[sub[1]]
                d2 = f"proposal_generator.rpn_head.{name}"
            elif sub[0] == "box_head":
                holder = ("box_predictor" if sub[1] in ("cls_score",
                                                        "bbox_pred")
                          else "box_head")
                d2 = f"roi_heads.{holder}.{sub[1]}"
        elif mods[0] == "keypoint_head":
            d2 = f"roi_heads.keypoint_head.{mods[1]}"
        elif mods[0] == "coarse_head":
            d2 = f"roi_heads.mask_coarse_head.{mods[1]}"
        elif mods[0] == "point_head":
            d2 = f"roi_heads.mask_point_head.{mods[1]}"
        elif mods[0] == "densepose_head":
            d2 = f"roi_heads.densepose_head.{mods[1]}"
        elif mods[0] == "densepose_predictor":
            d2 = f"roi_heads.densepose_predictor.{mods[1]}"
        else:
            raise KeyError(mods)
        # leaf conversion
        if leaf == "kernel":
            out[f"{d2}.weight"] = v.transpose(3, 2, 0, 1) if v.ndim == 4 else v.T
        elif leaf == "scale":
            out[f"{d2}.weight"] = v
        elif leaf == "bias":
            out[f"{d2}.bias"] = v
        elif leaf == "mean":
            out[f"{d2}.running_mean"] = v
        elif leaf == "var":
            out[f"{d2}.running_var"] = v

    def walk(tree, path, coll):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + (k,), coll)
            else:
                emit(coll, path + (k,), v)

    for coll in ("params", "batch_stats"):
        if coll in variables:
            walk(variables[coll], (), coll)
    return out


class TestD2Converter:
    def test_roundtrip_tree_identity(self, kp_model_and_vars):
        """flax vars -> d2-style names -> convert back = identical tree."""
        model, variables = kp_model_and_vars
        d2_state = _flax_to_d2_names(
            {"params": jax.tree_util.tree_map(np.asarray, variables["params"]),
             "batch_stats": jax.tree_util.tree_map(
                 np.asarray, variables["batch_stats"])})
        assert "backbone.bottom_up.stem.conv1.weight" in d2_state
        assert "backbone.bottom_up.res2.0.shortcut.weight" in d2_state
        assert "proposal_generator.rpn_head.objectness_logits.weight" in d2_state
        assert "roi_heads.keypoint_head.conv_fcn1.weight" in d2_state
        back = convert_d2_state(d2_state)
        flat_orig = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
                     jax.tree_util.tree_leaves_with_path(variables["params"])}
        flat_back = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
                     jax.tree_util.tree_leaves_with_path(back["params"])}
        assert set(flat_orig) == set(flat_back), (
            set(flat_orig) ^ set(flat_back))
        for k in flat_orig:
            np.testing.assert_array_equal(flat_orig[k], flat_back[k], err_msg=k)
        # batch stats too
        bs_orig = {jax.tree_util.keystr(p) for p, _ in
                   jax.tree_util.tree_leaves_with_path(variables["batch_stats"])}
        bs_back = {jax.tree_util.keystr(p) for p, _ in
                   jax.tree_util.tree_leaves_with_path(back["batch_stats"])}
        assert bs_orig == bs_back

    def test_converted_weights_run(self, kp_model_and_vars):
        model, variables = kp_model_and_vars
        d2_state = _flax_to_d2_names(
            {"params": jax.tree_util.tree_map(np.asarray, variables["params"]),
             "batch_stats": jax.tree_util.tree_map(
                 np.asarray, variables["batch_stats"])})
        back = convert_d2_state(d2_state)
        img = jnp.asarray(np.random.RandomState(2)
                          .randn(IMG, IMG, 3).astype(np.float32))
        ref = model.apply(variables, img)
        got = model.apply({"params": back["params"],
                           "batch_stats": back["batch_stats"]}, img)
        np.testing.assert_allclose(np.asarray(got["boxes"]),
                                   np.asarray(ref["boxes"]), atol=1e-5)


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
