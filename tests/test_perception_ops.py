import numpy as np
import jax.numpy as jnp

from straps_tpu.perception.ops import (
    pairwise_iou, nms_fixed, encode_boxes, decode_boxes, clip_boxes,
    roi_align, multilevel_roi_align, bilinear_sample,
)
from straps_tpu.perception.anchors import grid_anchors, fpn_anchors

RNG = np.random.RandomState(0)


def naive_nms(boxes, scores, thresh):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or scores[i] == -np.inf:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (a + b - inter + 1e-9) > thresh:
                suppressed[j] = True
    return keep


class TestBoxes:
    def test_iou_known(self):
        a = jnp.asarray([[0.0, 0, 10, 10]])
        b = jnp.asarray([[5.0, 5, 15, 15], [20.0, 20, 30, 30]])
        iou = np.asarray(pairwise_iou(a, b))
        np.testing.assert_allclose(iou, [[25 / 175, 0.0]], atol=1e-6)

    def test_encode_decode_roundtrip(self):
        anchors = jnp.asarray(RNG.uniform(0, 100, (32, 4)).astype(np.float32))
        anchors = jnp.concatenate([anchors[:, :2],
                                   anchors[:, :2] + 10 + anchors[:, 2:] * 0],
                                  axis=1)
        boxes = anchors + jnp.asarray(RNG.uniform(-3, 3, (32, 4)).astype(np.float32))
        deltas = encode_boxes(boxes, anchors, weights=(10, 10, 5, 5))
        back = decode_boxes(deltas, anchors, weights=(10, 10, 5, 5))
        np.testing.assert_allclose(np.asarray(back), np.asarray(boxes),
                                   atol=1e-3)

    def test_clip(self):
        b = jnp.asarray([[-5.0, -5, 300, 300]])
        np.testing.assert_array_equal(np.asarray(clip_boxes(b, 256, 256)),
                                      [[0, 0, 256, 256]])


class TestNms:
    def test_matches_naive(self):
        for trial in range(3):
            rng = np.random.RandomState(trial)
            centres = rng.uniform(10, 90, (40, 2))
            wh = rng.uniform(5, 25, (40, 2))
            boxes = np.concatenate([centres - wh / 2, centres + wh / 2],
                                   axis=1).astype(np.float32)
            scores = rng.rand(40).astype(np.float32)
            idx, valid = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                                   0.5, 16)
            got = [int(i) for i, v in zip(np.asarray(idx), np.asarray(valid)) if v]
            expected = naive_nms(boxes, scores, 0.5)[:16]
            assert got == expected, (trial, got, expected)

    def test_blocked_matches_naive_multiblock(self):
        """Exactness of the blocked formulation across block boundaries:
        dense overlaps + suppression chains spanning blocks (r3: the naive
        N-sequential loop was replaced by the blocked fixpoint algorithm)."""
        for trial in range(3):
            rng = np.random.RandomState(100 + trial)
            n = 300
            centres = rng.uniform(10, 120, (n, 2))   # dense -> long chains
            wh = rng.uniform(10, 40, (n, 2))
            boxes = np.concatenate([centres - wh / 2, centres + wh / 2],
                                   axis=1).astype(np.float32)
            scores = rng.rand(n).astype(np.float32)
            for block in (64, 128, 512):
                idx, valid = nms_fixed(jnp.asarray(boxes),
                                       jnp.asarray(scores), 0.5, 32,
                                       block=block)
                got = [int(i) for i, v in zip(np.asarray(idx),
                                              np.asarray(valid)) if v]
                expected = naive_nms(boxes, scores, 0.5)[:32]
                assert got == expected, (trial, block)

    def test_invalid_candidates_skipped(self):
        boxes = jnp.asarray([[0.0, 0, 10, 10], [100.0, 100, 110, 110]])
        scores = jnp.asarray([0.9, -np.inf])
        idx, valid = nms_fixed(boxes, scores, 0.5, 4)
        assert np.asarray(valid).sum() == 1
        assert int(idx[0]) == 0


class TestRoiAlign:
    def _naive(self, feat, box, scale, out_size, s):
        H, W, C = feat.shape
        x1, y1, x2, y2 = box * scale - 0.5
        bw = max((x2 - x1), 1e-6) / out_size
        bh = max((y2 - y1), 1e-6) / out_size
        out = np.zeros((out_size, out_size, C), np.float32)

        def sample(x, y):
            # torchvision bilinear_interpolate: zero beyond the 1px band,
            # clamp to the edge texel inside it.
            if x < -1.0 or x > W or y < -1.0 or y > H:
                return np.zeros(C, np.float32)
            x = min(max(x, 0.0), W - 1.0)
            y = min(max(y, 0.0), H - 1.0)
            x0, y0 = int(np.floor(x)), int(np.floor(y))
            fx, fy = x - x0, y - y0
            val = np.zeros(C, np.float32)
            for dy in (0, 1):
                for dx in (0, 1):
                    xi, yi = min(x0 + dx, W - 1), min(y0 + dy, H - 1)
                    w = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                    val += w * feat[yi, xi]
            return val

        for i in range(out_size):
            for j in range(out_size):
                acc = np.zeros(C, np.float32)
                for ky in range(s):
                    for kx in range(s):
                        x = x1 + (j * s + kx + 0.5) / s * bw
                        y = y1 + (i * s + ky + 0.5) / s * bh
                        acc += sample(x, y)
                out[i, j] = acc / (s * s)
        return out

    def test_matches_naive(self):
        feat = RNG.randn(16, 16, 3).astype(np.float32)
        # The last two boxes cross the image border: their outer sample
        # rows land in the 1px clamp band (real detectron2 semantics).
        boxes = np.asarray([[8.0, 4.0, 40.0, 28.0],
                            [0.0, 0.0, 64.0, 64.0],
                            [-6.0, -2.0, 20.0, 30.0],
                            [40.0, 30.0, 70.0, 68.0]], np.float32)
        got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes),
                                   0.25, 4, sampling_ratio=2))
        for r in range(len(boxes)):
            expected = self._naive(feat, boxes[r], 0.25, 4, 2)
            np.testing.assert_allclose(got[r], expected, atol=1e-4)

    def test_constant_field_exact(self):
        feat = np.full((8, 8, 1), 3.0, np.float32)
        out = np.asarray(roi_align(jnp.asarray(feat),
                                   jnp.asarray([[4.0, 4.0, 24.0, 24.0]]),
                                   0.25, 7))
        np.testing.assert_allclose(out, 3.0, atol=1e-5)

    def test_multilevel_assignment(self):
        feats = [jnp.asarray(np.full((256 // s, 256 // s, 1),
                                     float(i), np.float32))
                 for i, s in enumerate((4, 8, 16, 32))]
        # canonical_size=16: 20px box -> level 4 (value 2), 60px box ->
        # level 5 (value 3); interior boxes so every bilinear sample lands
        # fully on its constant map -> exact values.
        boxes = jnp.asarray([[100.0, 100, 120, 120], [100.0, 100, 160, 160]])
        out = np.asarray(multilevel_roi_align(feats, boxes, (4, 8, 16, 32), 2,
                                              canonical_size=16.0))
        np.testing.assert_allclose(out[0], 2.0, atol=1e-5)
        np.testing.assert_allclose(out[1], 3.0, atol=1e-5)

    def test_einsum_matches_gather(self):
        """The MXU (two-einsum) formulation must agree with the packed
        gather path on boxes spanning all levels, including boxes whose
        sample taps fall outside the feature map (validity zeros)."""
        feats = [jnp.asarray(RNG.randn(256 // s, 256 // s, 8)
                             .astype(np.float32))
                 for s in (4, 8, 16, 32)]
        boxes = jnp.asarray([
            [10.0, 12.0, 40.0, 50.0],       # small -> fine level
            [30.0, 20.0, 150.0, 180.0],     # mid
            [0.0, 0.0, 250.0, 250.0],       # large -> coarse level
            [-20.0, -10.0, 30.0, 25.0],     # crosses the top-left border
            [200.0, 210.0, 300.0, 290.0],   # crosses the bottom-right
            [40.0, 60.0, 40.0, 60.0],       # zero-area (degenerate NMS pad)
            [-90.0, -80.0, -50.0, -40.0],   # entirely outside: all taps zero
        ], jnp.float32)
        for aligned in (True, False):
            a = np.asarray(multilevel_roi_align(
                feats, boxes, (4, 8, 16, 32), 7, canonical_size=64.0,
                aligned=aligned, method="einsum"))
            b = np.asarray(multilevel_roi_align(
                feats, boxes, (4, 8, 16, 32), 7, canonical_size=64.0,
                aligned=aligned, method="gather"))
            np.testing.assert_allclose(a, b, atol=1e-4)

    def test_einsum_bf16_close(self):
        """bf16 features ride the MXU natively; result stays within bf16
        tolerance of the f32 gather reference."""
        feats32 = [jnp.asarray(RNG.randn(64 // s * 4, 64 // s * 4, 8)
                               .astype(np.float32)) for s in (4, 8, 16, 32)]
        boxes = jnp.asarray([[10.0, 12.0, 40.0, 50.0],
                             [30.0, 20.0, 150.0, 180.0]], jnp.float32)
        ref = np.asarray(multilevel_roi_align(
            feats32, boxes, (4, 8, 16, 32), 7, canonical_size=64.0,
            method="gather"))
        got = np.asarray(multilevel_roi_align(
            [f.astype(jnp.bfloat16) for f in feats32], boxes,
            (4, 8, 16, 32), 7, canonical_size=64.0,
            method="einsum")).astype(np.float32)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got, ref, atol=0.03 * scale)


class TestAnchors:
    def test_grid_anchor_geometry(self):
        a = grid_anchors(2, 2, 16, 32.0, (1.0,))
        assert a.shape == (4, 4)
        # first anchor centred at (0, 0), 32x32
        np.testing.assert_allclose(a[0], [-16, -16, 16, 16])
        # last anchor centred at (16, 16)
        np.testing.assert_allclose(a[3], [0, 0, 32, 32])

    def test_aspect_ratios_preserve_area(self):
        a = grid_anchors(1, 1, 4, 64.0, (0.5, 1.0, 2.0))
        areas = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        np.testing.assert_allclose(areas, 64.0 * 64.0, rtol=1e-5)
        hw = (a[:, 3] - a[:, 1]) / (a[:, 2] - a[:, 0])
        np.testing.assert_allclose(hw, [0.5, 1.0, 2.0], rtol=1e-5)

    def test_fpn_counts(self):
        per_level = fpn_anchors(256)
        assert len(per_level) == 5
        assert per_level[0].shape == (64 * 64 * 3, 4)
        assert per_level[4].shape == (4 * 4 * 3, 4)


class TestAdaptiveSampling:
    """detectron2 POOLER_SAMPLING_RATIO=0 (adaptive ceil(roi/out) samples
    per bin) vs the independent torch oracle `tv_roi_align` — the KP-RCNN /
    PointRend configs leave the box/keypoint poolers at this d2 default."""

    # Aspect-extreme, border-crossing, tiny and degenerate boxes: the grid
    # count varies per box and per axis (1..ceil(map/out)).
    BOXES = np.asarray([
        [8.0, 4.0, 40.0, 28.0],       # grid ~2x3
        [0.0, 0.0, 64.0, 64.0],       # full map, grid 4x4
        [-6.0, -2.0, 20.0, 30.0],     # border band taps
        [2.0, 10.0, 62.0, 14.0],      # wide thin: gw >> gh
        [12.0, 0.0, 15.0, 60.0],      # tall thin: gh >> gw
        [5.0, 5.0, 6.0, 6.0],         # sub-bin: grid 1x1
        [40.0, 30.0, 40.0, 50.0],     # zero-width (degenerate)
    ], np.float32)

    def _oracle(self, feat_hwc, boxes, scale, out_size, aligned):
        import torch
        from torch_twin_d2 import tv_roi_align
        f = torch.from_numpy(feat_hwc).permute(2, 0, 1)[None]
        rois = torch.cat([torch.zeros(len(boxes), 1),
                          torch.from_numpy(boxes)], dim=1)
        out = tv_roi_align(f, rois, out_size, spatial_scale=scale,
                           sampling_ratio=0, aligned=aligned)
        return out.permute(0, 2, 3, 1).numpy()

    def test_single_level_vs_torch_oracle(self):
        import pytest
        pytest.importorskip("torch")
        feat = RNG.randn(16, 16, 3).astype(np.float32)
        for aligned in (True, False):
            got = np.asarray(roi_align(jnp.asarray(feat),
                                       jnp.asarray(self.BOXES),
                                       0.25, 4, sampling_ratio=0,
                                       aligned=aligned))
            ref = self._oracle(feat, self.BOXES, 0.25, 4, aligned)
            np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_degenerate_aligned_box_is_zero(self):
        """aligned=True + zero-extent roi: d2's grid count is 0 -> the
        output bin is exactly zero (count=max(0,1) divides a zero sum)."""
        feat = np.abs(RNG.randn(16, 16, 2)).astype(np.float32) + 1.0
        out = np.asarray(roi_align(jnp.asarray(feat),
                                   jnp.asarray([[20.0, 12.0, 20.0, 40.0]]),
                                   0.25, 4, sampling_ratio=0, aligned=True))
        np.testing.assert_array_equal(out, 0.0)

    def test_multilevel_vs_torch_oracle(self):
        import pytest
        torch = pytest.importorskip("torch")
        from torch_twin_d2 import d2_multilevel_roi_align
        feats = [RNG.randn(256 // s, 256 // s, 8).astype(np.float32)
                 for s in (4, 8, 16, 32)]
        boxes = np.asarray([
            [10.0, 12.0, 40.0, 50.0],
            [30.0, 20.0, 150.0, 180.0],
            [0.0, 0.0, 250.0, 250.0],
            [-20.0, -10.0, 30.0, 25.0],
            [0.0, 100.0, 256.0, 110.0],    # extreme aspect at a fine level
            [40.0, 60.0, 40.0, 60.0],      # zero-area
        ], np.float32)
        tfeats = [torch.from_numpy(f).permute(2, 0, 1)[None] for f in feats]
        for aligned in (True, False):
            ref = d2_multilevel_roi_align(
                tfeats, torch.from_numpy(boxes), (4, 8, 16, 32), 7,
                sampling_ratio=0, aligned=aligned)
            got = np.asarray(multilevel_roi_align(
                [jnp.asarray(f) for f in feats], boxes, (4, 8, 16, 32), 7,
                sampling_ratio=0, aligned=aligned))
            np.testing.assert_allclose(
                got, ref.permute(0, 2, 3, 1).numpy(), atol=2e-4)

    def test_fixed_ratio_oracle_unchanged(self):
        """The adaptive rewrite of the torch oracle must not have moved its
        fixed-ratio semantics: s=2 still matches the JAX fixed path."""
        import pytest
        pytest.importorskip("torch")
        feat = RNG.randn(16, 16, 3).astype(np.float32)
        got = np.asarray(roi_align(jnp.asarray(feat),
                                   jnp.asarray(self.BOXES[:5]), 0.25, 4,
                                   sampling_ratio=2))
        ref = self._oracle(feat, self.BOXES[:5], 0.25, 4, True)  # s=0 ref
        # s=2 and adaptive agree only where the adaptive grid is 2x2; just
        # assert the s=2 path against its own oracle instead:
        import torch
        from torch_twin_d2 import tv_roi_align
        f = torch.from_numpy(feat).permute(2, 0, 1)[None]
        rois = torch.cat([torch.zeros(5, 1),
                          torch.from_numpy(self.BOXES[:5])], dim=1)
        ref2 = tv_roi_align(f, rois, 4, spatial_scale=0.25,
                            sampling_ratio=2).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, ref2, atol=2e-4)
        assert not np.allclose(ref, ref2, atol=1e-5)  # adaptive != fixed
