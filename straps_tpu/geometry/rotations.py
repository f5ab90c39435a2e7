"""Rotation representations as pure jnp functions.

Covers the conversions the reference performs with torch/cv2
(`utils/rigid_transform_utils.py`, smplx `batch_rodrigues`), re-written as
batched, jit-friendly XLA ops.
"""

import jax
import jax.numpy as jnp


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation -> 3x3 rotation matrices (Zhou et al. CVPR19).

    Semantics match the reference (`utils/rigid_transform_utils.py:27-41`):
    the 6 numbers are interpreted as a (3, 2) matrix whose columns are
    Gram-Schmidt-orthonormalised into the first two columns of R.

    Args:
      x: (..., 6) batch of 6D rotations.
    Returns:
      (..., 3, 3) rotation matrices.
    """
    batch_shape = x.shape[:-1]
    x = x.reshape(batch_shape + (3, 2))
    a1 = x[..., 0]
    a2 = x[..., 1]
    eps = 1e-12  # torch F.normalize clamps the norm at 1e-12
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), eps)
    proj = jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2u = a2 - proj
    b2 = b2u / jnp.maximum(jnp.linalg.norm(b2u, axis=-1, keepdims=True), eps)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_rot6d(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `rot6d_to_rotmat`: keep the first two columns of R."""
    batch_shape = R.shape[:-2]
    return R[..., :, :2].reshape(batch_shape + (6,))


def rodrigues(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle vectors -> rotation matrices (Rodrigues formula).

    Replaces smplx `batch_rodrigues` / cv2.Rodrigues used by the reference
    (`augmentation/smpl_augmentation.py:55-59`,
    `utils/rigid_transform_utils.py:17`).

    Args:
      axis_angle: (..., 3) rotation vectors.
    Returns:
      (..., 3, 3) rotation matrices.
    """
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    # Guard the zero-rotation singularity; sin(x)/x -> 1, (1-cos x)->0.
    safe_angle = jnp.maximum(angle, 1e-8)
    axis = axis_angle / safe_angle
    kx, ky, kz = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([zeros, -kz, ky], axis=-1),
            jnp.stack([kz, zeros, -kx], axis=-1),
            jnp.stack([-ky, kx, zeros], axis=-1),
        ],
        axis=-2,
    )
    s = jnp.sin(angle)[..., None]
    c = jnp.cos(angle)[..., None]
    # R = cI + sK + (1-c) axis axis^T.  The outer-product form avoids a K@K
    # matmul that would otherwise hit the MXU at reduced default precision.
    outer = axis[..., :, None] * axis[..., None, :]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis_angle.dtype), K.shape)
    R = c * eye + s * K + (1.0 - c) * outer
    # Exactly identity for zero rotations.
    is_zero = (angle[..., None] < 1e-8)
    return jnp.where(is_zero, eye, R)


def rotmat_to_axis_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices -> axis-angle (log map). Inverse of `rodrigues`.

    Three branches on sin(angle): the generic antisymmetric-part formula;
    zeros at angle~0; and at angle~pi (where the antisymmetric part
    vanishes — R = -I + 2 axis axis^T) the axis is recovered from the
    dominant column of (R + I)/2.  The pi-branch sign is inherently
    ambiguous (R(pi, a) == R(pi, -a)); either log is returned.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    angle = jnp.arccos(cos)
    # Off-diagonal antisymmetric part gives axis * 2 sin(angle).
    ax = R[..., 2, 1] - R[..., 1, 2]
    ay = R[..., 0, 2] - R[..., 2, 0]
    az = R[..., 1, 0] - R[..., 0, 1]
    axis = jnp.stack([ax, ay, az], axis=-1)
    sin = jnp.sin(angle)[..., None]
    small = jnp.abs(sin) < 1e-6
    axis = jnp.where(small, jnp.zeros_like(axis),
                     axis / jnp.where(small, 1.0, 2.0 * sin))
    # angle ~ pi: (R + I)/2 ~ axis axis^T; take its largest-diagonal
    # column (guaranteed >= 1/3 on the axis' dominant component).  The
    # branch engages below sin < 1e-3, where the antisymmetric entries
    # (differences of near-equal O(1) values) lose ~half their f32 bits
    # to cancellation while the symmetric form stays well-conditioned.
    sym = (R + jnp.eye(3, dtype=R.dtype)) / 2.0
    diag = jnp.stack([sym[..., 0, 0], sym[..., 1, 1], sym[..., 2, 2]],
                     axis=-1)
    k = jnp.argmax(diag, axis=-1)
    onehot = jax.nn.one_hot(k, 3, dtype=R.dtype)
    col = jnp.einsum("...ij,...j->...i", sym, onehot)
    dmax = jnp.maximum(jnp.max(diag, axis=-1, keepdims=True), 1e-12)
    axis_pi = col / jnp.sqrt(dmax)
    near_pi = (jnp.abs(sin) < 1e-3) & (trace[..., None] < 0.0)
    axis = jnp.where(near_pi, axis_pi, axis)
    return axis * angle[..., None]


def rotate_translate_points(points: jnp.ndarray, R: jnp.ndarray,
                            t: jnp.ndarray) -> jnp.ndarray:
    """Apply `p -> R p + t` to a batch of point sets.

    Mirrors `utils/rigid_transform_utils.py:7-24` without host round-trips.

    Args:
      points: (B, N, 3)
      R: (3, 3) or (B, 3, 3)
      t: (3,) or (B, 3)
    """
    if R.ndim == 2:
        out = jnp.einsum("ij,bkj->bki", R, points, precision="highest")
    else:
        out = jnp.einsum("bij,bkj->bki", R, points, precision="highest")
    if t.ndim == 1:
        return out + t
    return out + t[:, None, :]
