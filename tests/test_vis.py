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
