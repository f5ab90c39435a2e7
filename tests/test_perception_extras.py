import numpy as np
import jax
import jax.numpy as jnp
import pytest

from straps_tpu.perception.pointrend import (
    importance_sample_points, mask_point_loss, uncertainty,
    sample_mask_at_points, paste_mask,
)
from straps_tpu.perception.densepose import (
    ASPP, DensePoseDeepLabHead, densepose_losses, encode_iuv_png,
    decode_iuv_png,
)
from straps_tpu.render import render_rgb
from straps_tpu.smpl import load_synthetic_assets
from straps_tpu.geometry import get_intrinsics_matrix

KEY = jax.random.PRNGKey(0)


class TestPointRendTraining:
    def test_importance_sampling_counts_and_bounds(self):
        coarse = jnp.asarray(np.random.RandomState(0)
                             .randn(3, 7, 7, 1).astype(np.float32))
        pts = importance_sample_points(KEY, coarse, num_points=196)
        assert pts.shape == (3, 196, 2)
        p = np.asarray(pts)
        assert p.min() >= 0.0 and p.max() <= 1.0

    def test_importance_points_more_uncertain_than_random(self):
        coarse = jnp.asarray(np.random.RandomState(1)
                             .randn(2, 7, 7, 1).astype(np.float32) * 5)
        pts = importance_sample_points(KEY, coarse, num_points=100)
        unc_chosen = jax.vmap(lambda c, p: uncertainty(
            sample_mask_at_points(c, p)[..., 0]))(coarse, pts[:, :75])
        rand = jax.random.uniform(jax.random.PRNGKey(9), (2, 75, 2))
        unc_rand = jax.vmap(lambda c, p: uncertainty(
            sample_mask_at_points(c, p)[..., 0]))(coarse, rand)
        assert float(unc_chosen.mean()) > float(unc_rand.mean())

    def test_point_loss_perfect_prediction_small(self):
        # Half-plane mask: bilinear samples are exactly 0/1 away from the
        # single boundary column, so a perfect prediction drives BCE ~ 0.
        m = np.zeros((2, 28, 28), np.float32)
        m[:, :, 14:] = 1.0
        gt = jnp.asarray(m)
        pts = jax.random.uniform(KEY, (2, 50, 2))
        gt_at = jax.vmap(lambda m, p: sample_mask_at_points(
            m[..., None], p)[..., 0])(gt, pts)
        perfect = (gt_at * 2 - 1)[..., None] * 20.0  # confident correct logits
        loss_good = float(mask_point_loss(perfect, gt, pts))
        loss_bad = float(mask_point_loss(-perfect, gt, pts))
        assert loss_good < 0.5 < loss_bad

    def test_paste_mask_roundtrip(self):
        logits = jnp.full((28, 28), 10.0)
        box = jnp.asarray([16.0, 16.0, 48.0, 48.0])
        out = np.asarray(paste_mask(logits, box, 64, 64))
        assert out[32, 32] == 1.0
        assert out[8, 8] == 0.0
        # area roughly box area
        assert abs(out.sum() - 32 * 32) < 200

    def test_paste_mask_matches_gather_oracle(self):
        """The separable-matmul paste must equal the direct per-pixel
        bilinear_sample formulation, including boxes crossing the image
        border."""
        from straps_tpu.perception.ops import bilinear_sample

        rng = np.random.RandomState(4)
        logits = jnp.asarray(rng.randn(28, 28).astype(np.float32) * 3)
        for box in ([10.0, 6.0, 50.0, 44.0], [-12.0, -5.0, 30.0, 40.0],
                    [40.0, 30.0, 90.0, 80.0]):
            box = jnp.asarray(box)
            got = np.asarray(paste_mask(logits, box, 64, 64))
            S = 28
            ys = jnp.arange(64, dtype=jnp.float32) + 0.5
            xs = jnp.arange(64, dtype=jnp.float32) + 0.5
            u = (xs[None, :] - box[0]) / (box[2] - box[0])
            v = (ys[:, None] - box[1]) / (box[3] - box[1])
            px = jnp.broadcast_to(u * S - 0.5, (64, 64))
            py = jnp.broadcast_to(v * S - 0.5, (64, 64))
            vals = bilinear_sample(jax.nn.sigmoid(logits)[..., None],
                                   px, py)[..., 0]
            inside = (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
            ref = np.asarray((vals * inside) > 0.5).astype(np.float32)
            assert (got == ref).mean() > 0.999

    def test_subdivision_single_channel_equivalence(self):
        """`channel=0` refines a 1-channel grid; its output must be
        bit-identical to channel 0 of the all-channel run (the MLP sees
        the full coarse logits either way)."""
        from straps_tpu.perception.pointrend import (
            PointHead, subdivision_inference)

        rng = np.random.RandomState(7)
        R, K, C = 3, 8, 16
        coarse = jnp.asarray(rng.randn(R, 7, 7, K).astype(np.float32))
        p2 = jnp.asarray(rng.randn(32, 32, C).astype(np.float32))
        boxes = jnp.asarray([[4.0, 4.0, 60.0, 60.0],
                             [10.0, 0.0, 40.0, 50.0],
                             [0.0, 0.0, 127.0, 127.0]], jnp.float32)
        head = PointHead(fc_dim=32, num_classes=K)
        variables = head.init(KEY, jnp.zeros((R, 5, C)), jnp.zeros((R, 5, K)))
        apply = lambda f, c: head.apply(variables, f, c)
        full = subdivision_inference(apply, coarse, p2, boxes,
                                     steps=3, num_points=49)
        one = subdivision_inference(apply, coarse, p2, boxes,
                                    steps=3, num_points=49, channel=0)
        assert one.shape == full.shape[:3] + (1,)
        np.testing.assert_array_equal(np.asarray(one[..., 0]),
                                      np.asarray(full[..., 0]))


class TestDensePoseExtras:
    def test_deeplab_head_shapes(self):
        head = DensePoseDeepLabHead(conv_dim=64, num_convs=1)
        x = jnp.zeros((2, 14, 14, 32))
        variables = head.init(KEY, x)
        out = head.apply(variables, x)
        assert out.shape == (2, 14, 14, 64)

    def test_losses_behave(self):
        rng = np.random.RandomState(0)
        R, S, P = 2, 16, 20
        gt_segm = jnp.asarray(rng.randint(0, 15, (R, S, S)))
        gt_points = jnp.asarray(rng.rand(R, P, 2).astype(np.float32))
        gt_part = jnp.asarray(rng.randint(0, 25, (R, P)))
        gt_u = jnp.asarray(rng.rand(R, P).astype(np.float32))
        gt_v = jnp.asarray(rng.rand(R, P).astype(np.float32))
        valid = jnp.ones((R, P), bool)
        s = jax.nn.one_hot(gt_segm, 15) * 20.0  # perfect seg
        i = jnp.asarray(rng.randn(R, S, S, 25).astype(np.float32))
        u = jnp.asarray(rng.rand(R, S, S, 25).astype(np.float32))
        v = jnp.asarray(rng.rand(R, S, S, 25).astype(np.float32))
        out = densepose_losses(s, i, u, v, gt_segm, gt_points, gt_part,
                               gt_u, gt_v, valid)
        assert float(out["segm"]) < 1e-3      # perfect seg -> ~0 CE
        for k in ("total", "part", "u", "v"):
            assert np.isfinite(float(out[k]))
        # masking: zero valid points -> point losses zero
        out0 = densepose_losses(s, i, u, v, gt_segm, gt_points, gt_part,
                                gt_u, gt_v, jnp.zeros((R, P), bool))
        assert float(out0["part"]) == 0.0
        assert float(out0["u"]) == 0.0

    def test_iuv_codec_roundtrip(self):
        iuv = np.random.RandomState(0).randint(0, 255, (24, 32, 3), np.uint8)
        s = encode_iuv_png(iuv)
        assert isinstance(s, str)
        back = decode_iuv_png(s)
        np.testing.assert_array_equal(back, iuv)

    def test_deeplab_nonlocal_block(self):
        from straps_tpu.perception.densepose import DensePoseDeepLabHead
        head = DensePoseDeepLabHead(conv_dim=64, num_convs=1,
                                    use_nonlocal=True)
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(2, 14, 14, 32).astype(np.float32))
        variables = head.init(KEY, x)
        out = head.apply(variables, x)
        assert out.shape == (2, 14, 14, 64)
        assert "nonlocal" in variables["params"]
        assert np.all(np.isfinite(np.asarray(out)))

    def test_densepose_data_filter(self):
        from straps_tpu.perception.densepose import densepose_data_filter
        props = jnp.asarray([[0, 0, 10, 10],     # IoU 1.0 with gt
                             [0, 0, 10, 10],     # same but no annotation
                             [0, 0, 5, 10],      # IoU 0.5 (< 0.7)
                             [0, 0, 10, 10]],    # invalid detection
                            jnp.float32)
        gts = jnp.asarray([[0, 0, 10, 10]] * 4, jnp.float32)
        has_dp = jnp.asarray([True, False, True, True])
        valid = jnp.asarray([True, True, True, False])
        keep = np.asarray(densepose_data_filter(props, gts, has_dp, valid))
        np.testing.assert_array_equal(keep, [True, False, False, False])

    def test_iuv_uint8_packing(self):
        from straps_tpu.perception.densepose import iuv_to_uint8_image
        part = np.asarray([[0, 3], [24, 1]])
        u = np.asarray([[0.0, 0.5], [1.0, 2.0]])   # 2.0 clips to 255
        v = np.asarray([[1.0, 0.25], [0.0, -1.0]])
        img = iuv_to_uint8_image(part, u, v)
        assert img.dtype == np.uint8 and img.shape == (2, 2, 3)
        np.testing.assert_array_equal(img[..., 0], part)
        assert img[1, 1, 1] == 255 and img[1, 1, 2] == 0
        assert img[0, 1, 1] == 127

    def test_densepose_result_uint8_matches_torch(self):
        """`densepose_result_uint8` == the reference's `_output_to_result`
        (`DensePose/densepose/structures.py:374-401`) run verbatim in torch:
        resize S/I/U/V to the int box size, argmax-after-resize, per-part
        U/V select, *255 clamp-truncate to uint8.  fp-association can move a
        value across a uint8 bin edge only at ~1e-7-wide ties, so a ±1 LSB
        delta on <0.5% of pixels is tolerated; part labels must agree except
        at argmax ties."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        from straps_tpu.perception.densepose import densepose_result_uint8

        rng = np.random.RandomState(3)
        s = rng.randn(2, 56, 56).astype(np.float32)
        i = rng.randn(25, 56, 56).astype(np.float32)
        u = rng.rand(25, 56, 56).astype(np.float32)
        v = rng.rand(25, 56, 56).astype(np.float32)
        for box in ([12.7, 5.2, 100.4, 118.9], [30.0, 40.0, 30.5, 41.0]):
            x1, y1, x2, y2 = box
            h = max(int(y2 - y1), 1)
            w = max(int(x2 - x1), 1)
            tt = {k: torch.from_numpy(a)[None] for k, a in
                  (("s", s), ("i", i), ("u", u), ("v", v))}
            rs = {k: F.interpolate(t, (h, w), mode="bilinear",
                                   align_corners=False)[0]
                  for k, t in tt.items()}
            part_t = (rs["i"].argmax(0) * (rs["s"].argmax(0) > 0)).numpy()
            ref = np.zeros((h, w, 3), np.uint8)
            ref[..., 0] = part_t
            for pid in range(1, 25):
                sel = part_t == pid
                ref[..., 1][sel] = (rs["u"][pid].numpy()[sel]
                                    * 255).clip(0, 255).astype(np.uint8)
                ref[..., 2][sel] = (rs["v"][pid].numpy()[sel]
                                    * 255).clip(0, 255).astype(np.uint8)
            got = densepose_result_uint8(
                s.transpose(1, 2, 0), i.transpose(1, 2, 0),
                u.transpose(1, 2, 0), v.transpose(1, 2, 0),
                np.asarray(box, np.float32))
            assert got.shape == (h, w, 3) and got.dtype == np.uint8
            assert (got[..., 0] == ref[..., 0]).mean() > 0.999
            same_part = got[..., 0] == ref[..., 0]
            duv = np.abs(got[..., 1:].astype(int) - ref[..., 1:].astype(int))
            duv = duv[same_part]
            assert duv.max() <= 1
            assert (duv > 0).mean() < 0.005


class TestRenderRgb:
    def test_rgb_render(self):
        assets = load_synthetic_assets()
        colors = jnp.asarray(
            np.random.RandomState(0).rand(assets.num_faces, 3)
            .astype(np.float32))
        K = jnp.asarray(get_intrinsics_matrix(64, 64, 1250.0))
        cam_t = jnp.asarray(np.asarray([[0.0, 0.2, 42.0]], np.float32))
        rgb, depth = render_rgb(assets.v_template[None], cam_t, K,
                                assets.faces, colors, 64, backend="xla")
        assert rgb.shape == (1, 64, 64, 3)
        fg = np.asarray(depth[0]) < 1e30
        assert 0.02 < fg.mean() < 0.9
        assert np.asarray(rgb)[0][~fg].max() == 0.0
        assert np.asarray(rgb)[0][fg].max() > 0.1
