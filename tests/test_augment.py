import numpy as np
import jax
import jax.numpy as jnp

from straps_tpu.augment import (
    uniform_sample_shape, normal_sample_shape, augment_smpl, augment_cam_t,
    random_verts2d_deviation, random_joints2d_deviation,
    random_remove_bodyparts, random_occlude, augment_proxy_representation,
)

KEY = jax.random.PRNGKey(0)


class TestSmplAug:
    def test_uniform_shape_range(self):
        mean = jnp.zeros(10)
        s = np.asarray(uniform_sample_shape(KEY, 512, mean, (-3.0, 3.0)))
        assert s.shape == (512, 10)
        assert s.min() >= -3.0 and s.max() <= 3.0
        assert abs(s.mean()) < 0.2

    def test_normal_shape_std(self):
        mean = jnp.zeros(10)
        s = np.asarray(normal_sample_shape(KEY, 2048, mean, jnp.full(10, 1.5)))
        assert abs(s.std() - 1.5) < 0.1

    def test_augment_smpl_shapes(self):
        params = {"augment_shape": True, "delta_betas_distribution": "normal",
                  "delta_betas_std_vector": np.full(10, 1.5, np.float32),
                  "delta_betas_range": (-3.0, 3.0)}
        pose = jnp.zeros((4, 69))
        glob = jnp.zeros((4, 3))
        shape, pr, gr = augment_smpl(KEY, jnp.zeros((4, 10)), pose, glob,
                                     jnp.zeros(10), params)
        assert shape.shape == (4, 10)
        assert pr.shape == (4, 23, 3, 3)
        assert gr.shape == (4, 1, 3, 3)
        np.testing.assert_allclose(np.asarray(pr[0, 0]), np.eye(3), atol=1e-6)

    def test_no_augment_passthrough(self):
        params = {"augment_shape": False}
        orig = jnp.asarray(np.random.RandomState(0).randn(4, 10).astype(np.float32))
        shape, _, _ = augment_smpl(KEY, orig, jnp.zeros((4, 69)),
                                   jnp.zeros((4, 3)), jnp.zeros(10), params)
        np.testing.assert_array_equal(np.asarray(shape), np.asarray(orig))


class TestCamAug:
    def test_distributions(self):
        mean = jnp.tile(jnp.asarray([[0.0, 0.2, 42.0]]), (4096, 1))
        out = np.asarray(augment_cam_t(KEY, mean, xy_std=0.05,
                                       delta_z_range=(-5.0, 5.0)))
        assert abs(out[:, 0].std() - 0.05) < 0.01
        assert abs(out[:, 1].mean() - 0.2) < 0.01
        assert out[:, 2].min() >= 37.0 and out[:, 2].max() <= 47.0


class TestProxyAug:
    def test_verts_noise_only_xy(self):
        v = jnp.zeros((2, 100, 3))
        out = np.asarray(random_verts2d_deviation(KEY, v, (-0.01, 0.01)))
        assert np.abs(out[..., :2]).max() <= 0.01
        assert np.all(out[..., 2] == 0)

    def test_joint_deviation_ranges(self):
        j = jnp.zeros((256, 17, 2))
        out = np.asarray(random_joints2d_deviation(KEY, j, (-5.0, 5.0),
                                                   (-15.0, 15.0)))
        non_hip = [i for i in range(17) if i not in (11, 12)]
        assert np.abs(out[:, non_hip]).max() <= 5.0
        assert np.abs(out[:, (11, 12)]).max() <= 15.0
        assert np.abs(out[:, (11, 12)]).max() > 5.0  # hips actually wider

    def test_remove_bodyparts(self):
        seg = jnp.full((64, 8, 8), 3.0)
        out = np.asarray(random_remove_bodyparts(KEY, seg, [3], [0.5]))
        removed = (out == 0).all(axis=(1, 2))
        kept = (out == 3).all(axis=(1, 2))
        assert removed.sum() + kept.sum() == 64
        assert 10 < removed.sum() < 54  # ~50%

    def test_remove_only_listed_class(self):
        seg = jnp.asarray(np.tile(np.arange(7, dtype=np.float32), (8, 8, 1)))
        out = np.asarray(random_remove_bodyparts(KEY, seg, [2], [1.0]))
        assert not np.any(out == 2)
        for c in (1, 3, 4, 5, 6):
            assert np.any(out == c)

    def test_occlude_box(self):
        seg = jnp.ones((128, 256, 256))
        out = np.asarray(random_occlude(KEY, seg, occlude_probability=1.0,
                                        occlude_box_dim=48))
        holes = (out == 0).sum(axis=(1, 2))
        np.testing.assert_array_equal(holes, np.full(128, 48 * 48))
        # holes centred within middle 30%
        rows = np.where(out[0] == 0)[0]
        assert rows.min() >= 256 / 2 - 0.3 * 128 - 48
        out2 = np.asarray(random_occlude(KEY, seg, occlude_probability=0.0))
        assert (out2 == 1).all()

    def test_orchestrator(self):
        params = {"remove_appendages": True,
                  "remove_appendages_classes": [1, 2, 3, 4, 5, 6],
                  "remove_appendages_probabilities": [0.1] * 4 + [0.05] * 2,
                  "occlude_seg": True, "occlude_probability": 0.5,
                  "occlude_box_dim": 48, "deviate_joints2D": True,
                  "delta_j2d_dev_range": [-8, 8],
                  "delta_j2d_hip_dev_range": [-8, 8]}
        seg = jnp.ones((4, 256, 256))
        joints = jnp.full((4, 17, 2), 128.0)
        s, j = jax.jit(lambda k, s, j: augment_proxy_representation(
            k, s, j, params))(KEY, seg, joints)
        assert s.shape == seg.shape and j.shape == joints.shape
        assert np.abs(np.asarray(j) - 128).max() <= 8.0
