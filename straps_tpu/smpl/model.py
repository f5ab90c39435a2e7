"""Pure-JAX SMPL body model: blend shapes + linear blend skinning.

Re-implements the math the reference delegates to the external `smplx`
package (`models/smpl_official.py:3-5` and smplx `lbs.py`), as one fused,
batched jnp program: every stage is a batched matmul/einsum that XLA tiles
onto the MXU, and the whole forward jits into the surrounding training /
inference step.  Output convention matches the reference's 90-joint superset
(`models/smpl_official.py:30-34`, layout documented in
`straps_tpu.constants`).

Precision: blendshape/skinning matmuls use `precision="highest"` by default
so fp32 vertex outputs land within the <=1mm parity budget (BASELINE.md);
pass `precision=None` for fast bf16-MXU mode where parity is not needed.
"""

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from straps_tpu import constants as C
from straps_tpu.geometry.rotations import rodrigues
from straps_tpu.smpl.assets import SmplAssets


class SmplOutput(NamedTuple):
    vertices: jnp.ndarray        # (B, V, 3)
    joints: jnp.ndarray          # (B, 90, 3) superset
    tree_joints: jnp.ndarray     # (B, 24, 3) posed kinematic joints


def _rigid_transforms(rotmats: jnp.ndarray, joints: jnp.ndarray,
                      parents: np.ndarray, precision) -> jnp.ndarray:
    """World transforms of each joint down the kinematic tree.

    Args:
      rotmats: (B, 24, 3, 3) local joint rotations (root first).
      joints: (B, 24, 3) rest-pose joint locations.
      parents: static (24,) parent indices, root = -1.
    Returns:
      (B, 24, 4, 4) world transforms with the rest-pose joint position
      removed (the "A" matrices of the SMPL paper, ready for skinning).
    """
    B = rotmats.shape[0]
    rel = joints.at[:, 1:].add(-joints[:, np.asarray(parents[1:])])

    def make_tf(R, t):
        top = jnp.concatenate([R, t[..., None]], axis=-1)       # (B, 3, 4)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], R.dtype), (B, 1, 4))
        return jnp.concatenate([top, bottom], axis=-2)          # (B, 4, 4)

    transforms = [make_tf(rotmats[:, 0], rel[:, 0])]
    for j in range(1, rotmats.shape[1]):
        local = make_tf(rotmats[:, j], rel[:, j])
        transforms.append(
            jnp.einsum("bij,bjk->bik", transforms[parents[j]], local,
                       precision=precision))
    G = jnp.stack(transforms, axis=1)                           # (B, 24, 4, 4)
    # Remove the rest-pose joint position: A = G - pack(G @ [J; 0]).
    Gj = jnp.einsum("bjik,bjk->bji", G[..., :3, :3], joints, precision=precision)
    A = G.at[..., :3, 3].add(-Gj)
    return A, G


def smpl_forward(assets: SmplAssets,
                 betas: jnp.ndarray,
                 body_pose_rotmats: Optional[jnp.ndarray] = None,
                 glob_rotmats: Optional[jnp.ndarray] = None,
                 precision: Optional[str] = "highest") -> SmplOutput:
    """Batched SMPL forward.

    Equivalent to the reference call
    `smpl(body_pose=..., global_orient=..., betas=..., pose2rot=False)`
    (`train/train_synthetic_otf_rendering.py:132-137`) including the extra
    joint regressors of `models/smpl_official.py:27-41`.

    Args:
      betas: (B, 10) shape coefficients.
      body_pose_rotmats: (B, 23, 3, 3) or None for rest pose (the reference's
        `smpl(betas=...)` "reposed" call).
      glob_rotmats: (B, 1, 3, 3) or None for identity.
    Returns:
      SmplOutput with vertices (B, V, 3) and the 90-joint superset.
    """
    B = betas.shape[0]
    V = assets.num_verts
    dtype = assets.v_template.dtype
    eye = jnp.eye(3, dtype=dtype)
    identity_pose = body_pose_rotmats is None and glob_rotmats is None
    if body_pose_rotmats is None:
        body_pose_rotmats = jnp.broadcast_to(eye, (B, 23, 3, 3))
    if glob_rotmats is None:
        glob_rotmats = jnp.broadcast_to(eye, (B, 1, 3, 3))

    # 1. Shape blendshapes: v_shaped = T + S . beta   (MXU matmul).
    v_shaped = assets.v_template[None] + jnp.einsum(
        "vct,bt->bvc", assets.shapedirs, betas, precision=precision)

    # 2. Rest-pose joints from the shaped template.
    joints_rest = jnp.einsum("jv,bvc->bjc", assets.J_regressor, v_shaped,
                             precision=precision)

    if identity_pose:
        # Identity-rotation fast path — the reference's `smpl(betas=...)`
        # "reposed" call (`train_synthetic_otf_rendering.py:139-141`).
        # With every rotation identity the pose-blendshape term is exactly
        # zero and each skinning transform is exactly [I | 0] (its
        # translation j - I*j cancels bitwise), so LBS is the identity map
        # on v_shaped and the tree joints are the rest joints.  Skipping
        # the kinematic chain + skinning saves ~8% of the serving pipeline
        # (docs/ROOFLINE.md); outputs differ from the general path only by
        # the float re-association of the skipped per-vertex
        # sum_k w_k * v == v * sum_k w_k (~1 ulp).
        return _joint_superset_output(assets, v_shaped, joints_rest,
                                      precision)

    # 3. Pose blendshapes from the 23 body-joint rotations.
    pose_feature = (body_pose_rotmats - eye).reshape(B, 23 * 9)
    v_posed = v_shaped + jnp.einsum(
        "pd,bp->bd", assets.posedirs, pose_feature,
        precision=precision).reshape(B, V, 3)

    # 4. Kinematic chain -> skinning transforms.
    rotmats = jnp.concatenate([glob_rotmats, body_pose_rotmats], axis=1)
    A, G = _rigid_transforms(rotmats, joints_rest, assets.parents, precision)

    # 5. Linear blend skinning: T_v = sum_j w_vj A_j  (one (V,24)x(B,24,16)
    # matmul), then verts = T_v . [v; 1].
    T = jnp.einsum("vj,bjpq->bvpq", assets.lbs_weights, A,
                   precision=precision)
    verts = jnp.einsum("bvpq,bvq->bvp", T[..., :3, :3], v_posed,
                       precision=precision) + T[..., :3, 3]

    # 6. Joint superset: 24 tree joints + 21 vertex keypoints + 45 regressed.
    tree_joints = G[..., :3, 3]
    return _joint_superset_output(assets, verts, tree_joints, precision)


def _joint_superset_output(assets: SmplAssets, verts: jnp.ndarray,
                           tree_joints: jnp.ndarray,
                           precision) -> SmplOutput:
    """Assemble the 90-joint superset output (24 tree joints + 21 vertex
    keypoints + 45 regressed — `models/smpl_official.py:27-41`)."""
    extra_ids = np.asarray(
        [C.SMPL_VERTEX_IDS[k] for k in C.SMPL_EXTRA_KEYPOINT_ORDER], np.int32)
    picked = verts[:, extra_ids, :]
    reg = jnp.concatenate([assets.J_regressor_extra,
                           assets.J_regressor_cocoplus,
                           assets.J_regressor_h36m], axis=0)     # (45, V)
    regressed = jnp.einsum("jv,bvc->bjc", reg, verts, precision=precision)
    joints = jnp.concatenate([tree_joints, picked, regressed], axis=1)
    return SmplOutput(vertices=verts, joints=joints, tree_joints=tree_joints)


def smpl_forward_axis_angle(assets: SmplAssets, betas: jnp.ndarray,
                            pose_axis_angle: jnp.ndarray,
                            precision: Optional[str] = "highest") -> SmplOutput:
    """SMPL forward from a flat (B, 72) axis-angle pose (root first) —
    the reference's validation path (`train_synthetic_otf_rendering.py:258-260`)."""
    B = pose_axis_angle.shape[0]
    rotmats = rodrigues(pose_axis_angle.reshape(B, 24, 3))
    return smpl_forward(assets, betas,
                        body_pose_rotmats=rotmats[:, 1:],
                        glob_rotmats=rotmats[:, 0:1],
                        precision=precision)
