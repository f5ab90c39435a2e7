"""Rigid / similarity alignment used by the evaluation metrics.

Batched jnp re-design of `utils/eval_utils.py` — the reference loops over the
batch and calls numpy SVD per sample; here the whole batch goes through one
batched SVD so the metric math can stay on device inside a jitted eval step.
"""

import jax.numpy as jnp


def compute_similarity_transform(S1: jnp.ndarray, S2: jnp.ndarray) -> jnp.ndarray:
    """Procrustes-align batches of point sets S1 to S2.

    Solves for scale s, rotation R, translation t minimising
    ||s R S1 + t - S2||^2 and returns the transformed S1 (same semantics as
    `utils/eval_utils.py:7-63`, batched).

    Args:
      S1, S2: (B, N, 3) point sets.
    Returns:
      (B, N, 3) aligned S1.
    """
    mu1 = jnp.mean(S1, axis=1, keepdims=True)
    mu2 = jnp.mean(S2, axis=1, keepdims=True)
    X1 = S1 - mu1
    X2 = S2 - mu2
    var1 = jnp.sum(X1 ** 2, axis=(1, 2))
    # K = X1^T X2 over points: (B, 3, 3)
    K = jnp.einsum("bni,bnj->bij", X1, X2, precision="highest")
    U, _, Vh = jnp.linalg.svd(K)
    V = jnp.swapaxes(Vh, -1, -2)
    # Fix reflection so det(R) = +1.
    det = jnp.linalg.det(jnp.einsum("bij,bkj->bik", U, V, precision="highest"))
    Z = jnp.broadcast_to(jnp.eye(3, dtype=S1.dtype), K.shape).copy()
    Z = Z.at[:, -1, -1].set(jnp.sign(det))
    R = jnp.einsum("bij,bjk,blk->bil", V, Z, U, precision="highest")
    scale = jnp.einsum(
        "bii->b", jnp.einsum("bij,bjk->bik", R, K, precision="highest")) / var1
    t = mu2 - scale[:, None, None] * jnp.einsum("bij,bnj->bni", R, mu1, precision="highest")
    return scale[:, None, None] * jnp.einsum(
        "bij,bnj->bni", R, S1, precision="highest") + t


# Alias matching the reference's batched entry point.
procrustes_align = compute_similarity_transform


def scale_and_translation_transform(P: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Match mean and RMS scale of P to T (`utils/eval_utils.py:66-85`).

    Args:
      P: (B, N, 3) points to transform.
      T: (B, N, 3) reference points.
    Returns:
      (B, N, 3) transformed P.
    """
    P_mean = jnp.mean(P, axis=1, keepdims=True)
    P_trans = P - P_mean
    P_scale = jnp.sqrt(jnp.sum(P_trans ** 2, axis=(1, 2), keepdims=True) / P.shape[1])
    P_normalised = P_trans / P_scale
    T_mean = jnp.mean(T, axis=1, keepdims=True)
    T_scale = jnp.sqrt(jnp.sum((T - T_mean) ** 2, axis=(1, 2), keepdims=True) / T.shape[1])
    return P_normalised * T_scale + T_mean
