import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScipyRotation

from straps_tpu.geometry import (
    rot6d_to_rotmat, rotmat_to_rot6d, rodrigues, rotmat_to_axis_angle,
    rotate_translate_points, orthographic_project, get_intrinsics_matrix,
    perspective_project, weak_perspective_to_camera_translation,
    joints_to_gaussian_heatmaps, compute_similarity_transform,
    scale_and_translation_transform, undo_keypoint_normalisation,
    normalise_keypoints, check_joints2d_visibility, mask_bounding_box,
    crop_and_resize_seg_joints, batch_crop_and_resize,
)

RNG = np.random.RandomState(0)


def random_rotmats(n):
    return ScipyRotation.random(n, random_state=123).as_matrix().astype(np.float32)


class TestRotations:
    def test_rot6d_roundtrip(self):
        R = random_rotmats(16)
        six = rotmat_to_rot6d(jnp.asarray(R))
        R2 = rot6d_to_rotmat(six)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)

    def test_rot6d_orthonormal(self):
        x = jnp.asarray(RNG.randn(32, 6).astype(np.float32))
        R = np.asarray(rot6d_to_rotmat(x))
        eye = np.einsum("bij,bik->bjk", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), np.ones(32), atol=1e-5)

    def test_rodrigues_vs_scipy(self):
        aa = RNG.randn(64, 3).astype(np.float32)
        expected = ScipyRotation.from_rotvec(aa).as_matrix()
        got = np.asarray(rodrigues(jnp.asarray(aa)))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_rodrigues_zero(self):
        got = np.asarray(rodrigues(jnp.zeros((2, 3))))
        np.testing.assert_allclose(got, np.tile(np.eye(3), (2, 1, 1)), atol=1e-7)

    def test_axis_angle_roundtrip(self):
        aa = RNG.randn(32, 3).astype(np.float32) * 0.8
        R = rodrigues(jnp.asarray(aa))
        aa2 = np.asarray(rotmat_to_axis_angle(R))
        np.testing.assert_allclose(aa2, aa, atol=1e-4)

    def test_axis_angle_roundtrip_near_pi(self):
        """180-degree rotations: the antisymmetric part vanishes, so the
        log map must fall back to the symmetric-part axis recovery (the
        sign of the returned axis is ambiguous at exactly pi — assert the
        ROTATION round-trips, not the axis-angle vector)."""
        axes = np.asarray([[0, 0, 1.0], [1.0, 0, 0], [0, 1.0, 0],
                           [1.0, 1.0, 0], [0.3, -0.5, 0.81],
                           [-1.0, 2.0, 0.5]], np.float32)
        axes /= np.linalg.norm(axes, axis=1, keepdims=True)
        for angle in (np.pi, np.pi - 1e-4, np.pi - 1e-6):
            aa = (axes * angle).astype(np.float32)
            R = rodrigues(jnp.asarray(aa))
            aa2 = rotmat_to_axis_angle(R)
            R2 = np.asarray(rodrigues(aa2))
            np.testing.assert_allclose(R2, np.asarray(R), atol=2e-3,
                                       err_msg=f"angle={angle}")

    def test_rotate_translate(self):
        pts = RNG.randn(2, 5, 3).astype(np.float32)
        R = random_rotmats(1)[0]
        t = np.array([1.0, 2.0, 3.0], dtype=np.float32)
        got = np.asarray(rotate_translate_points(jnp.asarray(pts), jnp.asarray(R), jnp.asarray(t)))
        expected = pts @ R.T + t
        np.testing.assert_allclose(got, expected, atol=1e-5)


class TestCameras:
    def test_orthographic(self):
        pts = jnp.asarray(RNG.randn(3, 7, 3).astype(np.float32))
        cam = jnp.asarray(np.array([[2.0, 0.5, -0.5]] * 3, dtype=np.float32))
        proj = np.asarray(orthographic_project(pts, cam))
        expected_u = 2.0 * (np.asarray(pts)[..., 0] + 0.5)
        np.testing.assert_allclose(proj[..., 0], expected_u, atol=1e-5)

    def test_perspective_centre(self):
        K = jnp.asarray(get_intrinsics_matrix(256, 256, 5000.0))
        pts = jnp.asarray(np.array([[[0.0, 0.0, 0.0]]], dtype=np.float32))
        R = jnp.eye(3)
        t = jnp.asarray(np.array([[0.0, 0.0, 10.0]], dtype=np.float32))
        proj = np.asarray(perspective_project(pts, R, t, K))
        np.testing.assert_allclose(proj[0, 0], [128.0, 128.0], atol=1e-4)

    def test_perspective_offset(self):
        K = jnp.asarray(get_intrinsics_matrix(256, 256, 5000.0))
        pts = jnp.asarray(np.array([[[1.0, 2.0, 0.0]]], dtype=np.float32))
        t = jnp.asarray(np.array([[0.0, 0.0, 50.0]], dtype=np.float32))
        proj = np.asarray(perspective_project(pts, jnp.eye(3), t, K))
        np.testing.assert_allclose(proj[0, 0], [128.0 + 5000.0 / 50.0,
                                                128.0 + 2.0 * 5000.0 / 50.0], rtol=1e-5)

    def test_wp_to_cam_t(self):
        wp = jnp.asarray(np.array([[0.9, 0.1, -0.2]], dtype=np.float32))
        t = np.asarray(weak_perspective_to_camera_translation(wp, 5000.0, 256))
        np.testing.assert_allclose(t[0], [0.1, -0.2, 2 * 5000.0 / (256 * 0.9 + 1e-9)],
                                   rtol=1e-5)


class TestAlignment:
    def test_procrustes_recovers_similarity(self):
        pts = RNG.randn(4, 20, 3).astype(np.float32)
        R = random_rotmats(4)
        s = RNG.uniform(0.5, 2.0, size=(4, 1, 1)).astype(np.float32)
        t = RNG.randn(4, 1, 3).astype(np.float32)
        transformed = s * np.einsum("bij,bnj->bni", R, pts) + t
        aligned = np.asarray(compute_similarity_transform(
            jnp.asarray(pts), jnp.asarray(transformed)))
        np.testing.assert_allclose(aligned, transformed, atol=1e-3)

    def test_procrustes_handles_reflection(self):
        pts = RNG.randn(2, 15, 3).astype(np.float32)
        flipped = pts.copy()
        flipped[..., 0] *= -1
        aligned = np.asarray(compute_similarity_transform(
            jnp.asarray(pts), jnp.asarray(flipped)))
        # The aligned result must come from a proper rotation (det +1), so
        # it cannot match a reflection exactly, but must be finite and sane.
        assert np.all(np.isfinite(aligned))

    def test_scale_translation(self):
        P = RNG.randn(3, 10, 3).astype(np.float32)
        T = RNG.randn(3, 10, 3).astype(np.float32) * 2 + 1
        out = np.asarray(scale_and_translation_transform(jnp.asarray(P), jnp.asarray(T)))
        np.testing.assert_allclose(out.mean(axis=1), T.mean(axis=1), atol=1e-4)
        rms = lambda X: np.sqrt(np.sum((X - X.mean(axis=1, keepdims=True)) ** 2,
                                       axis=(1, 2)) / X.shape[1])
        np.testing.assert_allclose(rms(out), rms(T), rtol=1e-4)


class TestKeypoints:
    def test_normalise_roundtrip(self):
        kp = jnp.asarray(RNG.uniform(0, 256, size=(2, 17, 2)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(undo_keypoint_normalisation(normalise_keypoints(kp, 256), 256)),
            np.asarray(kp), atol=1e-4)

    def test_visibility(self):
        joints = jnp.asarray(np.array([[[10.0, 10.0], [-1.0, 5.0], [5.0, 300.0],
                                        [256.0, 0.0]]], dtype=np.float32))
        vis = np.asarray(check_joints2d_visibility(joints, 256))
        np.testing.assert_array_equal(vis[0], [True, False, False, True])


class TestHeatmaps:
    def _naive(self, joints, img_wh, std=4.0):
        B, J, _ = joints.shape
        size = 2 * std
        out = np.zeros((B, J, img_wh, img_wh), dtype=np.float32)
        centres = joints.astype(np.int32).astype(np.float32)
        for b in range(B):
            for j in range(J):
                cx, cy = centres[b, j]
                if not (cx > -size and cy > -size and cx < img_wh - 1 + size
                        and cy < img_wh - 1 + size):
                    continue
                for y in range(img_wh):
                    for x in range(img_wh):
                        dx, dy = x - cx, y - cy
                        if abs(dx) < size and abs(dy) < size:
                            out[b, j, y, x] = np.exp(-(dx * dx + dy * dy) / (2 * std * std))
        return out

    def test_matches_naive(self):
        joints = np.array([[[32.4, 40.9], [-3.0, 10.0], [60.0, 63.0], [-100.0, 5.0]]],
                          dtype=np.float32)
        got = np.asarray(joints_to_gaussian_heatmaps(jnp.asarray(joints), 64))
        expected = self._naive(joints, 64)
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_peak_location(self):
        joints = np.array([[[100.0, 50.0]]], dtype=np.float32)
        hm = np.asarray(joints_to_gaussian_heatmaps(jnp.asarray(joints), 256))
        y, x = np.unravel_index(hm[0, 0].argmax(), hm[0, 0].shape)
        assert (y, x) == (50, 100)
        assert hm[0, 0, y, x] == pytest.approx(1.0)

    @staticmethod
    def _reference_torch_heatmaps(joints, img_wh, std=4):
        """Independent numpy port of the reference paste-window loop
        (`utils/label_conversions.py:90-127`): linspace(-2std, 2std, 4std)
        Gaussian window, end-exclusive paste clipped at img_wh - 1."""
        B, J, _ = joints.shape
        size = 2 * std
        centres = joints.astype(np.int32)
        out = np.zeros((B, J, img_wh, img_wh), np.float32)
        g1 = np.linspace(-size, size, 2 * size)
        gx, gy = np.meshgrid(g1, g1, indexing="ij")
        gaussian = np.exp(-(gx ** 2 + gy ** 2) / (2.0 * std ** 2))
        for b in range(B):
            for j in range(J):
                cx, cy = int(centres[b, j, 0]), int(centres[b, j, 1])
                if not (cx > -size and cy > -size and
                        cx < img_wh - 1 + size and cy < img_wh - 1 + size):
                    continue
                hs_x, he_x = max(0, cx - size), min(img_wh - 1, cx + size)
                hs_y, he_y = max(0, cy - size), min(img_wh - 1, cy + size)
                gs_x = max(0, size - cx)
                ge_x = min(2 * size, 2 * size - (size + cx - (img_wh - 1)))
                gs_y = max(0, size - cy)
                ge_y = min(2 * size, 2 * size - (size + cy - (img_wh - 1)))
                out[b, j, hs_y:he_y, hs_x:he_x] = \
                    gaussian[gs_y:ge_y, gs_x:ge_x]
        return out

    def test_legacy_mode_matches_reference_loop(self):
        rng = np.random.RandomState(3)
        joints = np.concatenate([
            rng.uniform(-12, 76, (1, 20, 2)),        # incl. off-image
            np.array([[[0.0, 0.0], [63.0, 63.0], [62.9, 1.2], [-7.0, 30.0],
                       [70.0, 30.0], [30.0, 70.0]]]),  # window-edge cases
        ], axis=1).astype(np.float32)
        got = np.asarray(joints_to_gaussian_heatmaps(
            jnp.asarray(joints), 64, mode="legacy"))
        expected = self._reference_torch_heatmaps(joints, 64)
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_legacy_vs_clean_delta(self):
        """Quantify the clean-vs-legacy distribution delta (VERDICT r1
        Missing #3).  Interior joints: max-abs ~0.15 (the legacy grid's
        non-integer sample offsets, up to 1.07px near the window edge).
        Joints at the image border: delta reaches 1.0 because legacy's paste
        is end-exclusive at img_wh-1, so the last row/column is never
        written.  Documented in README/heatmaps.py."""
        rng = np.random.RandomState(4)
        interior = rng.uniform(16, 240, (16, 17, 2)).astype(np.float32)
        clean = np.asarray(joints_to_gaussian_heatmaps(
            jnp.asarray(interior), 256, mode="clean"))
        legacy = np.asarray(joints_to_gaussian_heatmaps(
            jnp.asarray(interior), 256, mode="legacy"))
        d = np.abs(clean - legacy)
        assert d.max() < 0.16 and d.mean() < 1e-3

        border = np.array([[[255.0, 128.0]]], np.float32)  # last column
        clean_b = np.asarray(joints_to_gaussian_heatmaps(
            jnp.asarray(border), 256, mode="clean"))
        legacy_b = np.asarray(joints_to_gaussian_heatmaps(
            jnp.asarray(border), 256, mode="legacy"))
        assert legacy_b[0, 0, :, 255].max() == 0.0     # end-exclusive paste
        assert clean_b[0, 0, 128, 255] == pytest.approx(1.0)


class TestBbox:
    def test_mask_bounding_box(self):
        m = np.zeros((32, 32), np.float32)
        m[5:12, 8:20] = 1
        r0, r1, c0, c1 = [int(v) for v in mask_bounding_box(jnp.asarray(m))]
        assert (r0, r1, c0, c1) == (5, 11, 8, 19)

    def test_empty_mask(self):
        m = jnp.zeros((16, 16))
        assert all(int(v) == 0 for v in mask_bounding_box(m))

    def _naive_crop(self, seg, joints, out_wh, scale):
        import cv2
        body = np.argwhere(seg != 0)
        bb = np.concatenate([body.min(axis=0), body.max(axis=0)])
        centre = np.array([(bb[0] + bb[2]) / 2.0, (bb[1] + bb[3]) / 2.0])
        hgt, wdt = bb[2] - bb[0], bb[3] - bb[1]
        wh = max(hgt, wdt) * scale
        tl = np.array([centre[0] - wh / 2, centre[1] - wh / 2]).astype(np.int16)
        br = np.array([centre[0] + wh / 2, centre[1] + wh / 2]).astype(np.int16)
        tl[tl < 0] = 0
        br[br < 0] = 0
        joints_out = joints - tl[::-1]
        crop = seg[tl[0]:br[0], tl[1]:br[1]]
        ch, cw = crop.shape
        resized = cv2.resize(crop, (out_wh, out_wh), interpolation=cv2.INTER_NEAREST)
        joints_out = joints_out * np.array([out_wh / float(cw), out_wh / float(ch)])
        return resized, joints_out

    def test_matches_cv2(self):
        seg = np.zeros((128, 128), np.float32)
        seg[30:90, 40:80] = RNG.randint(1, 7, size=(60, 40)).astype(np.float32)
        joints = RNG.uniform(20, 100, size=(17, 2)).astype(np.float32)
        got_seg, got_j = crop_and_resize_seg_joints(
            jnp.asarray(seg), jnp.asarray(joints), 64, jnp.float32(1.2))
        exp_seg, exp_j = self._naive_crop(seg, joints, 64, 1.2)
        np.testing.assert_allclose(np.asarray(got_j), exp_j, atol=1e-3)
        # Nearest-neighbour grids must match almost everywhere (allow a tiny
        # number of boundary-pixel differences from float rounding).
        mismatches = (np.asarray(got_seg) != exp_seg).mean()
        assert mismatches < 0.01, f"{mismatches:.4f} of pixels differ"

    def test_batch_crop(self):
        segs = np.zeros((4, 64, 64), np.float32)
        segs[:, 10:50, 15:45] = 1.0
        joints = RNG.uniform(10, 50, size=(4, 17, 2)).astype(np.float32)
        out_seg, out_j = batch_crop_and_resize(
            jnp.asarray(segs), jnp.asarray(joints), 32,
            jnp.full((4,), 1.2), jnp.zeros((4, 2)))
        assert out_seg.shape == (4, 32, 32)
        assert out_j.shape == (4, 17, 2)
        assert np.asarray(out_seg).max() == 1.0


class TestLabelConversions:
    def test_binary_labels(self):
        from straps_tpu.geometry import convert_multiclass_to_binary_labels
        seg = jnp.asarray(np.array([[0, 3], [6, 0]], np.int32))
        np.testing.assert_array_equal(
            np.asarray(convert_multiclass_to_binary_labels(seg)),
            [[0, 1], [1, 0]])

    def test_densepose_to_6part(self):
        from straps_tpu.geometry import convert_densepose_to_6part_lsp_labels
        dp = jnp.asarray(np.array([0, 1, 2, 3, 4, 23, 24], np.int32))
        out = np.asarray(convert_densepose_to_6part_lsp_labels(dp))
        # reference map: 1,2->torso(6); 3->2; 4->1; 5->4; 23,24->head(3)
        np.testing.assert_array_equal(out, [0, 6, 6, 2, 1, 3, 3])

    def test_pad_to_square(self):
        from straps_tpu.geometry import pad_to_square
        img = np.ones((10, 20, 3), np.float32)
        out = pad_to_square(img)
        assert out.shape == (20, 20, 3)
        assert out[:5].sum() == 0 and out[5:15].sum() > 0
