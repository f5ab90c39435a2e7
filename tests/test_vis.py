import os

import numpy as np
import pytest

from straps_tpu.render.vis import (
    shade_depth, render_body_vis, scatter_vis, proxy_vis, PART_COLORS,
)
from straps_tpu.smpl import load_synthetic_assets


class TestVis:
    def test_shade_depth_range_and_background(self):
        d = np.full((32, 32), 1e31, np.float32)
        d[8:24, 8:24] = np.linspace(40, 42, 16)[None, :].repeat(16, axis=0)
        s = shade_depth(d)
        assert s.shape == (32, 32)
        assert s.min() >= 0.0 and s.max() <= 1.0
        assert s[0, 0] == 0.0           # background black
        assert s[16, 16] > 0.0          # lit body

    def test_render_body_vis(self):
        assets = load_synthetic_assets()
        img = render_body_vis(np.asarray(assets.v_template),
                              np.asarray([0.9, 0.0, 0.0], np.float32),
                              assets, img_wh=128)
        assert img.shape == (128, 128, 3) and img.dtype == np.uint8
        # body visible as non-white pixels
        assert (img < 250).any()

    def test_render_body_vis_composited(self):
        assets = load_synthetic_assets()
        base = np.full((128, 128, 3), 128, np.uint8)
        img = render_body_vis(np.asarray(assets.v_template),
                              np.asarray([0.9, 0.0, 0.0], np.float32),
                              assets, img_wh=128, image=base)
        assert img.shape == (128, 128, 3)
        # background pixels keep the base value EXACTLY (reference overlay
        # is a hard replace, weak_perspective_pyrender_renderer.py:104-118)
        assert (img[0, 0] == 128).all()
        # and body pixels replace the base (some pixel differs from 128)
        assert (img != 128).any()

    def test_render_body_vis_overlay_resizes_base(self):
        # base image at a different resolution than the render frame
        assets = load_synthetic_assets()
        base = np.full((64, 64, 3), 200, np.uint8)
        img = render_body_vis(np.asarray(assets.v_template),
                              np.asarray([0.9, 0.0, 0.0], np.float32),
                              assets, img_wh=128, image=base)
        assert img.shape == (128, 128, 3)
        assert (img[0, 0] == 200).all()

    def test_scatter_and_proxy_vis(self, tmp_path):
        assets = load_synthetic_assets()
        sp = str(tmp_path / "v.png")
        scatter_vis(np.asarray(assets.v_template), sp)
        assert os.path.getsize(sp) > 1000
        proxy = np.zeros((64, 64, 18), np.float32)
        proxy[20:40, 20:40, 0] = 1
        pp = str(tmp_path / "p.png")
        proxy_vis(proxy, pp)
        assert os.path.getsize(pp) > 100  # tiny 64px grayscale PNG

    def test_part_colors_cover_convention(self):
        assert PART_COLORS.shape == (7, 3)  # bg + 6 parts


class TestLitShading:
    """Oracle tests for the exact pyrender-scene lighting
    (`weak_perspective_pyrender_renderer.py:50-95` constants)."""

    def test_single_triangle_hand_computed(self):
        # Independent scalar re-derivation of the glTF metallic-roughness
        # shade for ONE triangle, written with plain python floats (no
        # shared code with lit_face_colors).
        import math
        from straps_tpu.render.vis import lit_face_colors

        # Model-space verts -> GL frame (x, -y, -z):
        # g0=(0,0,-2) g1=(1,0,-2) g2=(0,1,-2), flat normal +z.
        verts = np.asarray([[0.0, 0.0, 2.0], [1.0, 0.0, 2.0],
                            [0.0, -1.0, 2.0]], np.float32)
        faces = np.asarray([[0, 1, 2]], np.int32)
        got = lit_face_colors(verts, faces)
        assert got.shape == (1, 3)

        # --- oracle ---
        nx, ny, nz = 0.0, 0.0, 1.0
        px, py, pz = 1.0 / 3.0, 1.0 / 3.0, -2.0
        plen = math.sqrt(px * px + py * py + pz * pz)
        vx, vy, vz = -px / plen, -py / plen, -pz / plen
        ndv = max(nx * vx + ny * vy + nz * vz, 1e-3)
        base = [0.8, 0.3, 0.3]
        metallic, alpha = 0.2, 1.0   # roughness 1.0 -> alpha 1.0
        expected = [0.3 * b for b in base]          # ambient
        for lx, ly, lz in ((0.0, -1.0, 1.0), (0.0, 1.0, 1.0)):
            dx, dy, dz = lx - px, ly - py, lz - pz
            dist = math.sqrt(dx * dx + dy * dy + dz * dz)
            ldx, ldy, ldz = dx / dist, dy / dist, dz / dist
            att = 1.0 / dist ** 2
            ndl = max(nx * ldx + ny * ldy + nz * ldz, 1e-3)
            hx, hy, hz = ldx + vx, ldy + vy, ldz + vz
            hlen = math.sqrt(hx * hx + hy * hy + hz * hz)
            hx, hy, hz = hx / hlen, hy / hlen, hz / hlen
            vdh = max(vx * hx + vy * hy + vz * hz, 0.0)
            # alpha=1: D = 1/pi, Smith vis = 0.5/(ndl+ndv).
            d_term = 1.0 / math.pi
            vis = 0.5 / (ndl + ndv)
            for c in range(3):
                f0 = 0.04 * (1 - metallic) + base[c] * metallic
                fr = f0 + (1 - f0) * (1 - vdh) ** 5
                cd = base[c] * 0.96 * (1 - metallic)
                expected[c] += att * ndl * ((1 - fr) * cd / math.pi
                                            + fr * d_term * vis)
        expected = [min(max(e, 0.0), 1.0) ** (1 / 2.2) for e in expected]
        np.testing.assert_allclose(got[0], expected, rtol=1e-5)

    def test_symmetric_lights_symmetric_shade(self):
        # The two lights are mirrored in y; a y-mirrored triangle pair must
        # shade identically.
        from straps_tpu.render.vis import lit_face_colors
        v = np.asarray([[0.0, 0.1, 2.0], [1.0, 0.2, 2.0], [0.0, 0.9, 2.0]],
                       np.float32)
        v_mirror = v * np.asarray([1.0, -1.0, 1.0], np.float32)
        verts = np.concatenate([v, v_mirror], axis=0)
        faces = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
        c = lit_face_colors(verts, faces)
        np.testing.assert_allclose(c[0], c[1], rtol=1e-5)

    def test_full_mesh_range_and_red_dominant(self):
        from straps_tpu.render.vis import lit_face_colors
        assets = load_synthetic_assets()
        c = lit_face_colors(np.asarray(assets.v_template) +
                            np.asarray([0.0, 0.0, 2.5], np.float32),
                            np.asarray(assets.faces))
        assert c.shape == (assets.faces.shape[0], 3)
        assert c.min() >= 0.0 and c.max() <= 1.0
        # base colour (0.8, 0.3, 0.3): red channel dominates everywhere
        assert (c[:, 0] >= c[:, 1] - 1e-6).all()
        # ambient floor: nothing is fully black
        assert c.min() > 0.05

    def test_render_body_vis_lit_vs_parts_styles(self):
        assets = load_synthetic_assets()
        cam = np.asarray([0.9, 0.0, 0.0], np.float32)
        lit = render_body_vis(np.asarray(assets.v_template), cam, assets,
                              img_wh=64, style="lit")
        parts = render_body_vis(np.asarray(assets.v_template), cam, assets,
                                img_wh=64, style="parts")
        assert lit.shape == parts.shape == (64, 64, 3)
        # lit body: red-dominant pixels somewhere
        fg = (lit < 250).any(-1)
        assert fg.any()
        assert (lit[fg][:, 0].astype(int) >=
                lit[fg][:, 1].astype(int) - 1).all()
        with pytest.raises(ValueError):
            render_body_vis(np.asarray(assets.v_template), cam, assets,
                            img_wh=64, style="nope")


class TestDetectorVis:
    def test_keypoints_vis_draws(self):
        from straps_tpu.render.vis import keypoints_vis
        img = np.zeros((64, 64, 3), np.uint8)
        kp = np.asarray([[32.0, 32.0, 0.9], [10.0, 50.0, 0.5]])
        out = keypoints_vis(img, kp)
        assert out.shape == (64, 64, 3)
        assert out[32, 32, 1] == 255          # green circle centre
        # input not mutated
        assert img.sum() == 0

    def test_silhouette_overlay_vis(self):
        from straps_tpu.render.vis import silhouette_overlay_vis
        img = np.full((32, 32, 3), 100, np.uint8)
        mask = np.zeros((32, 32), np.float32)
        mask[8:16, 8:16] = 1.0
        out = silhouette_overlay_vis(img, mask)
        # addWeighted(img, 1.0, 255*mask, 0.5): masked px brighten by ~127.5
        assert out[10, 10, 0] in (227, 228)
        assert np.all(out[0, 0] == 100)

    def test_densepose_overlay_and_paste(self):
        from straps_tpu.render.vis import densepose_overlay_vis, paste_roi_map
        roi = np.full((8, 8), 12, np.int32)
        i_img = paste_roi_map(roi, np.asarray([4.0, 6.0, 20.0, 22.0]), 32, 32)
        assert i_img.shape == (32, 32)
        assert i_img[7, 5] == 12 and i_img[0, 0] == 0
        img = np.full((32, 32, 3), 50, np.uint8)
        out = densepose_overlay_vis(img, i_img)
        assert out.shape == (32, 32, 3)
        # background stays 0.6 * img; foreground picks up colormap colour
        assert np.all(out[0, 0] == 30)
        assert out[7, 5].sum() > out[0, 0].sum()

    def test_verts_over_image_vis(self, tmp_path):
        from straps_tpu.render.vis import verts_over_image_vis
        p = str(tmp_path / "v.png")
        verts_over_image_vis(np.random.RandomState(0).rand(50, 2) * 64,
                             np.zeros((64, 64, 3), np.uint8), p)
        import os
        assert os.path.getsize(p) > 0

    def test_render_body_vis_rotate_x180(self):
        from straps_tpu.render.vis import render_body_vis
        from straps_tpu.smpl import load_synthetic_assets
        assets = load_synthetic_assets()
        cam = np.asarray([0.8, 0.0, -0.2], np.float32)
        up = render_body_vis(np.asarray(assets.v_template), cam, assets,
                             img_wh=64)
        down = render_body_vis(np.asarray(assets.v_template), cam, assets,
                               img_wh=64, rotate_x180=True)
        assert up.shape == down.shape == (64, 64, 3)
        fg_up = (up.sum(-1) > 0)
        fg_down = (down.sum(-1) > 0)
        assert fg_up.any() and fg_down.any()
        # the flip moves the body: foreground rows mirror (roughly)
        rows_up = np.flatnonzero(fg_up.any(axis=1))
        rows_down = np.flatnonzero(fg_down.any(axis=1))
        assert abs((rows_up.mean() - 32) + (rows_down.mean() - 32)) < 8
