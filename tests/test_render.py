import numpy as np
import jax.numpy as jnp
import pytest

from straps_tpu.geometry import get_intrinsics_matrix
from straps_tpu.render import (
    project_to_screen, prepare_face_planes, face_chunk_row_bounds,
    rasterize_xla, rasterize_pallas, face_ids_to_parts, render_part_seg,
    FACE_CHUNK,
)
from straps_tpu.smpl import load_synthetic_assets


def naive_rasterize(screen, z, faces, H, W):
    """Per-pixel point-in-triangle oracle (numpy, single sample)."""
    F = faces.shape[0]
    fid = np.full((H, W), -1, np.int32)
    depth = np.full((H, W), np.inf, np.float32)
    for f in range(F):
        p = screen[faces[f]]
        zv = z[faces[f]]
        area = (p[1, 0] - p[0, 0]) * (p[2, 1] - p[0, 1]) - \
               (p[1, 1] - p[0, 1]) * (p[2, 0] - p[0, 0])
        if abs(area) < 1e-9 or np.any(zv <= 1e-6):
            continue
        s = np.sign(area)
        xmin = max(int(np.floor(p[:, 0].min())), 0)
        xmax = min(int(np.ceil(p[:, 0].max())) + 1, W)
        ymin = max(int(np.floor(p[:, 1].min())), 0)
        ymax = min(int(np.ceil(p[:, 1].max())) + 1, H)
        nx = (p[1, 1] - p[0, 1]) * (zv[2] - zv[0]) - (zv[1] - zv[0]) * (p[2, 1] - p[0, 1])
        ny = (zv[1] - zv[0]) * (p[2, 0] - p[0, 0]) - (p[1, 0] - p[0, 0]) * (zv[2] - zv[0])
        for y in range(ymin, ymax):
            for x in range(xmin, xmax):
                px, py = x + 0.5, y + 0.5
                inside = True
                for a, b in ((0, 1), (1, 2), (2, 0)):
                    # cross(b - a, p - a), same sign as area when inside
                    e = (p[b, 0] - p[a, 0]) * (py - p[a, 1]) - \
                        (p[b, 1] - p[a, 1]) * (px - p[a, 0])
                    if e * s < 0:
                        inside = False
                        break
                if inside:
                    zp = zv[0] - (nx * (px - p[0, 0]) + ny * (py - p[0, 1])) / area
                    if zp < depth[y, x]:
                        depth[y, x] = zp
                        fid[y, x] = f
    return fid, depth


def make_triangle_scene():
    """Two overlapping triangles at different depths, already in screen space."""
    screen = np.array([
        [8.0, 8.0], [56.0, 8.0], [8.0, 56.0],      # big triangle, far
        [20.0, 20.0], [44.0, 20.0], [20.0, 44.0],  # small triangle, near
    ], np.float32)
    z = np.array([10.0, 10.0, 10.0, 5.0, 5.0, 5.0], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    return screen, z, faces


class TestXlaRaster:
    def test_two_triangles_vs_naive(self):
        screen, z, faces = make_triangle_scene()
        planes = prepare_face_planes(jnp.asarray(screen[None]),
                                     jnp.asarray(z[None]),
                                     jnp.asarray(faces)).planes
        fid, depth = rasterize_xla(planes, 64, 64, chunk=2)
        nfid, ndepth = naive_rasterize(screen, z, faces, 64, 64)
        # Non-trivial scene: both faces must actually be visible.
        assert np.any(nfid == 0) and np.any(nfid == 1)
        np.testing.assert_array_equal(np.asarray(fid[0]), nfid)
        fg = nfid >= 0
        np.testing.assert_allclose(np.asarray(depth[0])[fg], ndepth[fg],
                                   rtol=1e-5)

    def test_winding_invariance(self):
        screen, z, faces = make_triangle_scene()
        flipped = faces[:, ::-1].copy()
        p1 = prepare_face_planes(jnp.asarray(screen[None]), jnp.asarray(z[None]),
                                 jnp.asarray(faces)).planes
        p2 = prepare_face_planes(jnp.asarray(screen[None]), jnp.asarray(z[None]),
                                 jnp.asarray(flipped)).planes
        f1, _ = rasterize_xla(p1, 64, 64, chunk=2)
        f2, _ = rasterize_xla(p2, 64, 64, chunk=2)
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))

    def test_behind_camera_culled(self):
        screen, z, faces = make_triangle_scene()
        z[3:] = -1.0  # near triangle behind camera
        planes = prepare_face_planes(jnp.asarray(screen[None]),
                                     jnp.asarray(z[None]),
                                     jnp.asarray(faces)).planes
        fid, _ = rasterize_xla(planes, 64, 64, chunk=2)
        assert not np.any(np.asarray(fid) == 1)
        assert np.any(np.asarray(fid) == 0)

    def test_synthetic_body_render(self):
        """Whole synthetic SMPL body through projection + raster at 64x64."""
        assets = load_synthetic_assets()
        verts = assets.v_template[None]
        cam_t = jnp.asarray(np.array([[0.0, 0.2, 42.0]], np.float32))
        K = jnp.asarray(get_intrinsics_matrix(64, 64, 1250.0))
        parts, depth = render_part_seg(verts, cam_t, K, assets.faces,
                                       assets.face_parts, 64, backend="xla")
        p = np.asarray(parts[0])
        assert p.shape == (64, 64)
        fg = (p > 0).mean()
        assert 0.02 < fg < 0.9, f"foreground fraction {fg}"
        # multiple parts visible
        assert len(np.unique(p)) >= 3


class TestPallasRaster:
    def test_matches_xla_triangles(self):
        screen, z, faces = make_triangle_scene()
        sj, zj = jnp.asarray(screen[None]), jnp.asarray(z[None])
        planes = prepare_face_planes(sj, zj, jnp.asarray(faces)).planes
        bounds = face_chunk_row_bounds(sj, jnp.asarray(faces), FACE_CHUNK, 64)
        fid_p, z_p = rasterize_pallas(planes, bounds, 64, 64, interpret=True)
        fid_x, z_x = rasterize_xla(planes, 64, 64, chunk=2)
        np.testing.assert_array_equal(np.asarray(fid_p), np.asarray(fid_x))
        fg = np.asarray(fid_x) >= 0
        np.testing.assert_allclose(np.asarray(z_p)[fg], np.asarray(z_x)[fg],
                                   rtol=1e-5)

    def test_matches_xla_synthetic_body(self):
        assets = load_synthetic_assets()
        verts = assets.v_template[None]
        cam_t = jnp.asarray(np.array([[0.0, 0.2, 42.0]], np.float32))
        K = jnp.asarray(get_intrinsics_matrix(64, 64, 1250.0))
        screen, z = project_to_screen(verts, cam_t, K)
        planes = prepare_face_planes(screen, z, assets.faces).planes
        bounds = face_chunk_row_bounds(screen, assets.faces, FACE_CHUNK, 64)
        fid_p, _ = rasterize_pallas(planes, bounds, 64, 64, interpret=True)
        fid_x, _ = rasterize_xla(planes, 64, 64)
        parts_p = np.asarray(face_ids_to_parts(fid_p, assets.face_parts))
        parts_x = np.asarray(face_ids_to_parts(fid_x, assets.face_parts))
        # Identical face picks except possible float ties: compare part maps.
        mismatch = (parts_p != parts_x).mean()
        assert mismatch < 0.002, f"part map mismatch {mismatch:.5f}"

    def test_packed_attr_mode_parts_and_depth(self):
        """Attr mode packs the part id into the depth's low mantissa bits
        (pallas_raster.py ATTR_BITS): parts must agree with the fid-mode
        lookup except at sub-8-ulp z ties, and the returned depth must match
        the unpacked depth to the documented 2**ATTR_BITS-ulp quantisation."""
        from straps_tpu.render.pallas_raster import ATTR_BITS
        assets = load_synthetic_assets()
        verts = assets.v_template[None]
        cam_t = jnp.asarray(np.array([[0.0, 0.2, 42.0]], np.float32))
        K = jnp.asarray(get_intrinsics_matrix(64, 64, 1250.0))
        screen, z = project_to_screen(verts, cam_t, K)
        planes = prepare_face_planes(screen, z, assets.faces).planes
        bounds = face_chunk_row_bounds(screen, assets.faces, FACE_CHUNK, 64)
        parts_a, z_a = rasterize_pallas(planes, bounds, 64, 64,
                                        interpret=True,
                                        face_attr=assets.face_parts)
        fid_p, z_p = rasterize_pallas(planes, bounds, 64, 64, interpret=True)
        parts_ref = np.asarray(face_ids_to_parts(fid_p, assets.face_parts))
        mismatch = (np.asarray(parts_a) != parts_ref).mean()
        assert mismatch < 0.002, f"attr-mode part mismatch {mismatch:.5f}"
        fg = np.asarray(fid_p) >= 0
        za, zp = np.asarray(z_a)[fg], np.asarray(z_p)[fg]
        # quantised depth: |delta| <= 2**ATTR_BITS ulps of the f32 value
        ulps = np.abs(za.view(np.int32).astype(np.int64)
                      - zp.view(np.int32).astype(np.int64))
        assert ulps.max() <= 2 ** ATTR_BITS, ulps.max()


class TestFaceSorting:
    def test_pallas_rejects_unaligned_img_h(self):
        """img_h not a multiple of ROWS_PER_BLOCK would silently leave the
        bottom rows' output block uninitialised — must be a loud error."""
        from straps_tpu.render.pallas_raster import rasterize_pallas

        planes = jnp.zeros((1, 128, 4, 3))
        bounds = jnp.zeros((1, 1, 2), jnp.int32)
        with pytest.raises(ValueError, match="multiple of 8"):
            rasterize_pallas(planes, bounds, img_h=100, img_w=128,
                             interpret=True)

    def test_sort_faces_by_ymin(self):
        from straps_tpu.render.raster import sort_faces_by_ymin
        screen, z, faces = make_triangle_scene()
        sj = jnp.asarray(screen[None])
        planes = prepare_face_planes(sj, jnp.asarray(z[None]),
                                     jnp.asarray(faces)).planes
        # Make face 1 start above face 0 so sorting must swap them.
        screen2 = screen.copy()
        screen2[3:, 1] -= 18.0
        sj2 = jnp.asarray(screen2[None])
        planes2 = prepare_face_planes(sj2, jnp.asarray(z[None]),
                                      jnp.asarray(faces)).planes
        sorted_p, order = sort_faces_by_ymin(planes2, sj2, jnp.asarray(faces))
        np.testing.assert_array_equal(np.asarray(order[0]), [1, 0])
        np.testing.assert_allclose(np.asarray(sorted_p[0, 0]),
                                   np.asarray(planes2[0, 1]))


class TestSortedPallasRender:
    def test_render_part_seg_pallas_matches_xla(self):
        """Full render_part_seg pallas path (with face sorting) vs xla."""
        assets = load_synthetic_assets()
        verts = assets.v_template[None]
        cam_t = jnp.asarray(np.array([[0.0, 0.2, 42.0]], np.float32))
        K = jnp.asarray(get_intrinsics_matrix(64, 64, 1250.0))
        parts_p, _ = render_part_seg(verts, cam_t, K, assets.faces,
                                     assets.face_parts, 64, backend="pallas",
                                     interpret=True)
        parts_x, _ = render_part_seg(verts, cam_t, K, assets.faces,
                                     assets.face_parts, 64, backend="xla")
        mismatch = (np.asarray(parts_p) != np.asarray(parts_x)).mean()
        assert mismatch < 0.002, mismatch


class TestBackfaceCull:
    """Culling back faces must not change the rendered output on the
    watertight SMPL mesh (the nearest face at every covered pixel is
    front-facing); it only empties the row bands of all-backface chunks."""

    def _scene(self, pose_seed=None):
        from straps_tpu.smpl import smpl_forward
        assets = load_synthetic_assets()
        if pose_seed is None:
            verts = assets.v_template[None]
        else:
            rng = np.random.RandomState(pose_seed)
            import jax
            from straps_tpu.geometry import rodrigues
            aa = jnp.asarray(rng.randn(1, 23, 3).astype(np.float32) * 0.3)
            glob = jnp.asarray(rng.randn(1, 1, 3).astype(np.float32) * 0.5)
            verts = smpl_forward(assets, jnp.zeros((1, 10)),
                                 rodrigues(aa), rodrigues(glob)).vertices
        cam_t = jnp.asarray(np.array([[0.0, 0.2, 42.0]], np.float32))
        K = jnp.asarray(get_intrinsics_matrix(64, 64, 1250.0))
        return assets, verts, cam_t, K

    def test_mask_kills_roughly_half(self):
        from straps_tpu.render.raster import backface_mask
        assets, verts, cam_t, K = self._scene()
        screen, _ = project_to_screen(verts, cam_t, K)
        frac = float(np.asarray(backface_mask(screen, assets.faces)).mean())
        assert 0.3 < frac < 0.7, frac

    @pytest.mark.parametrize("pose_seed", [None, 7])
    def test_xla_output_unchanged(self, pose_seed):
        assets, verts, cam_t, K = self._scene(pose_seed)
        base, d0 = render_part_seg(verts, cam_t, K, assets.faces,
                                   assets.face_parts, 64, backend="xla")
        cull, d1 = render_part_seg(verts, cam_t, K, assets.faces,
                                   assets.face_parts, 64, backend="xla",
                                   cull_backfaces=True)
        base, cull = np.asarray(base), np.asarray(cull)
        assert (base > 0).mean() > 0.02          # non-trivial scene
        mismatch = (base != cull).mean()
        assert mismatch < 0.001, mismatch        # edge pixels only
        # Depth can differ ONLY at self-intersection pixels, where a back
        # face of another body part is nearest (posed meshes); part ids
        # still agree there because the front surface behind it wins both
        # ways.  Bound that fraction tightly.
        both = (base > 0) & (cull > 0)
        dd = np.abs(np.asarray(d0)[both] - np.asarray(d1)[both])
        assert (dd > 1e-4).mean() < 0.01, (dd > 1e-4).mean()

    def test_pallas_interpret_matches_xla_uncull(self):
        assets, verts, cam_t, K = self._scene()
        ref, _ = render_part_seg(verts, cam_t, K, assets.faces,
                                 assets.face_parts, 64, backend="xla")
        p, _ = render_part_seg(verts, cam_t, K, assets.faces,
                               assets.face_parts, 64, backend="pallas",
                               interpret=True, cull_backfaces=True)
        mismatch = (np.asarray(ref) != np.asarray(p)).mean()
        assert mismatch < 0.002, mismatch


class TestDefaultBackend:
    def test_cpu_and_unaligned_pick_xla(self):
        from straps_tpu.render import default_raster_backend
        # conftest pins the cpu platform -> always xla here.
        assert default_raster_backend(256) == "xla"
        assert default_raster_backend(250) == "xla"   # not 8-row aligned


class TestPartsDecode:
    def test_face_ids_to_parts(self):
        fid = jnp.asarray(np.array([[-1, 0], [1, 2]], np.int32))
        fparts = jnp.asarray(np.array([3, 5, 6], np.int32))
        out = np.asarray(face_ids_to_parts(fid, fparts))
        np.testing.assert_array_equal(out, [[0, 3], [5, 6]])


class TestSoftSilhouette:
    def test_matches_hard_silhouette_coarsely(self):
        import jax
        from straps_tpu.render.soft_silhouette import soft_silhouette_from_wp
        from straps_tpu.render import render_silhouette
        from straps_tpu.geometry import (
            get_intrinsics_matrix, weak_perspective_to_camera_translation)
        assets = load_synthetic_assets()
        verts = assets.v_template[None]
        wp = jnp.asarray(np.array([[0.9, 0.0, 0.0]], np.float32))
        soft = np.asarray(soft_silhouette_from_wp(verts, wp, 64))
        # hard render with the equivalent perspective camera
        f = 5000.0 * 64 / 256.0
        cam_t = weak_perspective_to_camera_translation(wp, f, 64)
        K = jnp.asarray(get_intrinsics_matrix(64, 64, f))
        hard, _ = render_silhouette(verts, cam_t, K, assets.faces, 64,
                                    backend="xla")
        hard = np.asarray(hard[0])
        soft_bin = (soft[0] > 0.5).astype(np.float32)
        inter = (soft_bin * hard).sum()
        union = ((soft_bin + hard) > 0).sum()
        assert inter / union > 0.5, inter / union

    def test_gradient_flows_to_verts_and_cam(self):
        import jax
        from straps_tpu.render.soft_silhouette import soft_silhouette_from_wp
        assets = load_synthetic_assets()
        target = jnp.zeros((1, 32, 32))

        def loss(verts, wp):
            s = soft_silhouette_from_wp(verts, wp, 32)
            return jnp.mean((s - target) ** 2)

        g_v, g_c = jax.grad(loss, argnums=(0, 1))(
            assets.v_template[None], jnp.asarray([[0.9, 0.0, 0.0]]))
        assert float(jnp.abs(g_v).max()) > 0
        assert float(jnp.abs(g_c).max()) > 0
        assert np.all(np.isfinite(np.asarray(g_v)))
