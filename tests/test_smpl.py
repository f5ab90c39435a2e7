"""SMPL forward tests against an independent numpy LBS implementation.

The numpy oracle below is written directly from the SMPL paper equations
(Loper et al. 2015, eq. 1-7) — an independent implementation used to
cross-check the fused JAX version.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScipyRotation

from straps_tpu import constants as C
from straps_tpu.smpl import load_synthetic_assets, smpl_forward, smpl_forward_axis_angle


def numpy_lbs(assets, betas, rotmats):
    """Independent single-sample LBS: betas (10,), rotmats (24, 3, 3)."""
    v_template = np.asarray(assets.v_template)
    shapedirs = np.asarray(assets.shapedirs)
    posedirs = np.asarray(assets.posedirs)
    J_reg = np.asarray(assets.J_regressor)
    W = np.asarray(assets.lbs_weights)
    parents = np.asarray(assets.parents)

    v_shaped = v_template + shapedirs @ betas
    J = J_reg @ v_shaped                                   # (24, 3)
    pose_feat = (rotmats[1:] - np.eye(3)).reshape(-1)      # (207,)
    v_posed = v_shaped + (pose_feat @ posedirs).reshape(-1, 3)

    G = np.zeros((24, 4, 4))
    G[0] = np.eye(4)
    G[0, :3, :3] = rotmats[0]
    G[0, :3, 3] = J[0]
    for j in range(1, 24):
        local = np.eye(4)
        local[:3, :3] = rotmats[j]
        local[:3, 3] = J[j] - J[parents[j]]
        G[j] = G[parents[j]] @ local
    A = G.copy()
    for j in range(24):
        A[j, :3, 3] -= G[j, :3, :3] @ J[j]
    T = np.einsum("vj,jpq->vpq", W, A)
    verts = np.einsum("vpq,vq->vp", T[:, :3, :3], v_posed) + T[:, :3, 3]
    posed_joints = G[:, :3, 3]
    return verts, posed_joints


@pytest.fixture(scope="module")
def assets():
    return load_synthetic_assets()


class TestSmplForward:
    def test_matches_numpy_oracle(self, assets):
        rng = np.random.RandomState(42)
        B = 3
        betas = rng.randn(B, 10).astype(np.float32) * 0.5
        aa = rng.randn(B, 24, 3).astype(np.float32) * 0.4
        rotmats = np.stack([ScipyRotation.from_rotvec(a).as_matrix() for a in aa]).astype(np.float32)
        out = smpl_forward(assets, jnp.asarray(betas),
                           body_pose_rotmats=jnp.asarray(rotmats[:, 1:]),
                           glob_rotmats=jnp.asarray(rotmats[:, 0:1]))
        for b in range(B):
            verts_np, joints_np = numpy_lbs(assets, betas[b], rotmats[b])
            np.testing.assert_allclose(np.asarray(out.vertices[b]), verts_np,
                                       atol=2e-5, rtol=1e-4)
            np.testing.assert_allclose(np.asarray(out.tree_joints[b]), joints_np,
                                       atol=2e-5, rtol=1e-4)

    def test_output_shapes(self, assets):
        out = smpl_forward(assets, jnp.zeros((2, 10)))
        assert out.vertices.shape == (2, C.NUM_VERTS, 3)
        assert out.joints.shape == (2, C.NUM_JOINTS_SUPERSET, 3)
        assert out.tree_joints.shape == (2, 24, 3)

    def test_rest_pose_identity(self, assets):
        """Zero pose + zero shape must reproduce the template."""
        out = smpl_forward(assets, jnp.zeros((1, 10)))
        np.testing.assert_allclose(np.asarray(out.vertices[0]),
                                   np.asarray(assets.v_template), atol=1e-5)

    def test_identity_fast_path_matches_general_lbs(self, assets):
        """`smpl_forward(assets, betas)` takes the identity-rotation fast
        path (skips the kinematic chain + skinning — exact math identity);
        it must match the GENERAL path fed explicit identity rotmats to
        float re-association noise (~1 ulp on metre-scale verts)."""
        rng = np.random.RandomState(7)
        betas = jnp.asarray(rng.randn(3, 10).astype(np.float32) * 0.8)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (3, 23, 3, 3))
        eye1 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (3, 1, 3, 3))
        fast = smpl_forward(assets, betas)
        general = smpl_forward(assets, betas, body_pose_rotmats=eye,
                               glob_rotmats=eye1)
        np.testing.assert_allclose(np.asarray(fast.vertices),
                                   np.asarray(general.vertices), atol=3e-6)
        np.testing.assert_allclose(np.asarray(fast.joints),
                                   np.asarray(general.joints), atol=3e-6)
        np.testing.assert_allclose(np.asarray(fast.tree_joints),
                                   np.asarray(general.tree_joints),
                                   atol=3e-6)

    def test_global_rotation_rotates_mesh(self, assets):
        R = ScipyRotation.from_euler("y", 90, degrees=True).as_matrix().astype(np.float32)
        out_rest = smpl_forward(assets, jnp.zeros((1, 10)))
        out_rot = smpl_forward(assets, jnp.zeros((1, 10)),
                               glob_rotmats=jnp.asarray(R[None, None]))
        # Rotation is about the root joint, not the origin.
        root = np.asarray(out_rest.tree_joints[0, 0])
        expected = (np.asarray(out_rest.vertices[0]) - root) @ R.T + root
        np.testing.assert_allclose(np.asarray(out_rot.vertices[0]), expected,
                                   atol=1e-4)

    def test_joint_superset_layout(self, assets):
        """Vertex-picked keypoints [24:45) must equal the picked vertices."""
        betas = jnp.asarray(np.random.RandomState(1).randn(2, 10).astype(np.float32) * 0.3)
        out = smpl_forward(assets, betas)
        ids = [C.SMPL_VERTEX_IDS[k] for k in C.SMPL_EXTRA_KEYPOINT_ORDER]
        np.testing.assert_allclose(np.asarray(out.joints[:, 24:45]),
                                   np.asarray(out.vertices)[:, ids], atol=1e-6)
        # h36m block is the last 17, produced by the h36m regressor.
        reg = np.asarray(assets.J_regressor_h36m)
        expected = np.einsum("jv,bvc->bjc", reg, np.asarray(out.vertices))
        np.testing.assert_allclose(np.asarray(out.joints[:, 73:90]), expected,
                                   atol=1e-5)

    def test_axis_angle_path(self, assets):
        rng = np.random.RandomState(7)
        betas = jnp.asarray(rng.randn(2, 10).astype(np.float32) * 0.3)
        pose = rng.randn(2, 72).astype(np.float32) * 0.3
        out_aa = smpl_forward_axis_angle(assets, betas, jnp.asarray(pose))
        rotmats = ScipyRotation.from_rotvec(pose.reshape(-1, 3)).as_matrix()
        rotmats = rotmats.reshape(2, 24, 3, 3).astype(np.float32)
        out_rm = smpl_forward(assets, betas,
                              body_pose_rotmats=jnp.asarray(rotmats[:, 1:]),
                              glob_rotmats=jnp.asarray(rotmats[:, 0:1]))
        np.testing.assert_allclose(np.asarray(out_aa.vertices),
                                   np.asarray(out_rm.vertices), atol=1e-4)

    def test_shape_changes_mesh(self, assets):
        out0 = smpl_forward(assets, jnp.zeros((1, 10)))
        out1 = smpl_forward(assets, jnp.ones((1, 10)))
        assert float(jnp.abs(out1.vertices - out0.vertices).max()) > 1e-3
