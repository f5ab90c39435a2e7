"""Mesh -> part-segmentation rasterisation, TPU-first.

Replaces the reference's CUDA neural_renderer part renderer
(`renderers/nmr_renderer.py:76-101`).  Design: rasterisation is reformulated
as the evaluation of per-face *affine plane functions* — three edge functions
plus one depth plane per face, each `a*x + b*y + c` — on pixel grids.  That
maps onto the TPU's VPU as large 2D broadcast tiles (faces x pixels) with a
min-depth reduction, with no data-dependent control flow, no atomics, and no
scatter.  Part ids come from a static per-face attribute instead of the
reference's render-color-then-decode cube LUT.

This module holds the camera projection + plane preparation (pure jnp) and a
scan-based XLA rasteriser that serves as the portable reference
implementation; `straps_tpu.render.pallas_raster` is the fused TPU kernel.

No gradients are needed: the reference renders under `torch.no_grad`
(`train/train_synthetic_otf_rendering.py:112`).
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class FacePlanes(NamedTuple):
    """Affine plane coefficients per face.

    planes: (B, F, 4, 3) — rows are [edge0, edge1, edge2, depth], columns are
      [coef_x, coef_y, const].  A pixel (x, y) is inside face f iff all three
      edge rows evaluate >= 0; its interpolated view-space depth is the
      4th row's evaluation.  Degenerate/behind-camera faces have edge consts
      set to -1 (never covered).
    """
    planes: jnp.ndarray


def project_to_screen(verts: jnp.ndarray, cam_t: jnp.ndarray,
                      cam_K: jnp.ndarray,
                      cam_R: Optional[jnp.ndarray] = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-space projection to pixel coords + view depth.

    Matches the NMR projection setup (`renderers/nmr_renderer.py:62-67`):
    `p_cam = R v + t`, pixel = K-normalised.

    Args:
      verts: (B, V, 3) model-space vertices.
      cam_t: (B, 3) camera translation.
      cam_K: (3, 3) intrinsics.
      cam_R: optional (3, 3) camera rotation (defaults to identity).
    Returns:
      screen_xy: (B, V, 2) pixel coordinates; depth: (B, V) view z.
    """
    if cam_R is not None:
        verts = jnp.einsum("ij,bvj->bvi", cam_R, verts, precision="highest")
    p = verts + cam_t[:, None, :]
    z = p[..., 2]
    fx, fy = cam_K[0, 0], cam_K[1, 1]
    cx, cy = cam_K[0, 2], cam_K[1, 2]
    x = fx * p[..., 0] / z + cx
    y = fy * p[..., 1] / z + cy
    return jnp.stack([x, y], axis=-1), z


def prepare_face_planes(screen_xy: jnp.ndarray, depth: jnp.ndarray,
                        faces: jnp.ndarray) -> FacePlanes:
    """Build the 4 affine plane functions for every face.

    Args:
      screen_xy: (B, V, 2) pixel-space vertices.
      depth: (B, V) view-space z per vertex.
      faces: (F, 3) int vertex indices.
    Returns:
      FacePlanes with (B, F, 4, 3) coefficients.
    """
    v = screen_xy[:, faces, :]          # (B, F, 3, 2)
    z = depth[:, faces]                 # (B, F, 3)
    x0, y0 = v[..., 0, 0], v[..., 0, 1]
    x1, y1 = v[..., 1, 0], v[..., 1, 1]
    x2, y2 = v[..., 2, 0], v[..., 2, 1]
    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    s = jnp.sign(area)

    def edge(ax, ay, bx, by):
        # Inside iff cross(b - a, p - a) has the same sign as the face area:
        # e(p) = s * [(bx-ax)(py-ay) - (by-ay)(px-ax)] >= 0.
        cx = -(by - ay) * s
        cy = (bx - ax) * s
        cc = (ax * (by - ay) - ay * (bx - ax)) * s
        return jnp.stack([cx, cy, cc], axis=-1)

    e0 = edge(x0, y0, x1, y1)
    e1 = edge(x1, y1, x2, y2)
    e2 = edge(x2, y2, x0, y0)

    # Depth plane: z(x, y) linear in screen space through the 3 vertices.
    z0, z1, z2 = z[..., 0], z[..., 1], z[..., 2]
    nx = (y1 - y0) * (z2 - z0) - (z1 - z0) * (y2 - y0)
    ny = (z1 - z0) * (x2 - x0) - (x1 - x0) * (z2 - z0)
    nz = area
    safe_nz = jnp.where(jnp.abs(nz) < 1e-9, 1.0, nz)
    zx = -nx / safe_nz
    zy = -ny / safe_nz
    zc = z0 - zx * x0 - zy * y0
    dplane = jnp.stack([zx, zy, zc], axis=-1)

    planes = jnp.stack([e0, e1, e2, dplane], axis=-2)  # (B, F, 4, 3)

    # Cull degenerate or behind-camera faces: make edges never-covered.
    bad = (jnp.abs(area) < 1e-9) | jnp.any(z <= 1e-6, axis=-1)
    kill = jnp.asarray([0.0, 0.0, -1.0], planes.dtype)
    planes = jnp.where(bad[..., None, None],
                       jnp.broadcast_to(kill, planes.shape), planes)
    return FacePlanes(planes=planes)


def sort_faces_by_ymin(planes: jnp.ndarray, screen_xy: jnp.ndarray,
                       faces: jnp.ndarray):
    """Sort each batch element's faces by screen ymin.

    After sorting, consecutive face chunks span narrow y ranges, so the
    rasteriser's per-chunk row-bound culling skips almost all chunks per
    pixel strip (the win scales with mesh size / image coverage).

    Returns (sorted planes (B, F, 4, 3), order (B, F) int32 mapping
    sorted index -> original face id).
    """
    vy = screen_xy[:, faces, 1]                       # (B, F, 3)
    fymin = jnp.min(vy, axis=-1)
    order = jnp.argsort(fymin, axis=1).astype(jnp.int32)
    sorted_planes = jnp.take_along_axis(
        planes, order[:, :, None, None], axis=1)
    return sorted_planes, order


def backface_mask(screen_xy: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """(B, F) bool: True where the face is BACK-facing in screen space.

    SMPL faces wind counter-clockwise viewed from outside; under the
    y-down pixel projection an outward (camera-facing) face therefore has
    positive signed area, so `area < 0` is the back side.  On a watertight
    mesh every visible pixel's nearest face is front-facing, so killing
    back faces leaves the rendered output unchanged
    (`tests/test_render.py::TestBackfaceCull` asserts this) while letting
    the rasteriser skip all-backface chunks via their row bounds."""
    v = screen_xy[:, faces, :]
    x0, y0 = v[..., 0, 0], v[..., 0, 1]
    x1, y1 = v[..., 1, 0], v[..., 1, 1]
    x2, y2 = v[..., 2, 0], v[..., 2, 1]
    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    return area < 0.0


def kill_faces(planes: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Make masked faces never-covered (edge consts -1), keeping shapes
    static — the culling idiom of `prepare_face_planes`."""
    kill = jnp.zeros((4, 3), planes.dtype).at[:3, 2].set(-1.0)
    return jnp.where(mask[..., None, None],
                     jnp.broadcast_to(kill, planes.shape), planes)


def face_chunk_row_bounds(screen_xy: jnp.ndarray, faces: jnp.ndarray,
                          chunk: int, img_h: int,
                          dead_mask: Optional[jnp.ndarray] = None
                          ) -> jnp.ndarray:
    """Per-face-chunk [ymin, ymax] row bounds for culling.

    Returns (B, num_chunks, 2) int32; chunks whose bound range misses a pixel
    row block can be skipped entirely by the rasteriser.  (For a sorted face
    order, pass screen_xy/faces reordered the same way — the removed
    `..._from_planes` variant was an unused near-duplicate.)

    `dead_mask` (B, F) marks faces already killed in the plane array (e.g.
    back faces): they are excluded from the bounds so chunks of dead faces
    collapse to an empty band and are skipped by the kernel.
    """
    vy = screen_xy[:, faces, 1]                  # (B, F, 3)
    fymin = jnp.min(vy, axis=-1)
    fymax = jnp.max(vy, axis=-1)
    # A face projecting to NaN (vertex at view z=0) must not poison its
    # chunk's min/max — NaN would propagate and cull the whole 128-face
    # chunk including its valid faces.  Degenerate bounds exclude just it.
    fymin = jnp.where(jnp.isnan(fymin), np.inf, fymin)
    fymax = jnp.where(jnp.isnan(fymax), -np.inf, fymax)
    if dead_mask is not None:
        fymin = jnp.where(dead_mask, np.inf, fymin)
        fymax = jnp.where(dead_mask, -np.inf, fymax)
    B, F = fymin.shape
    pad = (-F) % chunk
    if pad:
        fymin = jnp.pad(fymin, ((0, 0), (0, pad)), constant_values=np.inf)
        fymax = jnp.pad(fymax, ((0, 0), (0, pad)), constant_values=-np.inf)
    nch = (F + pad) // chunk
    cmin = jnp.min(fymin.reshape(B, nch, chunk), axis=-1)
    cmax = jnp.max(fymax.reshape(B, nch, chunk), axis=-1)
    lo = jnp.clip(jnp.floor(cmin), 0, img_h).astype(jnp.int32)
    hi = jnp.clip(jnp.ceil(cmax) + 1, 0, img_h).astype(jnp.int32)
    return jnp.stack([lo, hi], axis=-1)


def rasterize_xla(planes: jnp.ndarray, img_h: int, img_w: int,
                  chunk: int = 256) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan-based XLA rasteriser (portable reference path).

    Args:
      planes: (B, F, 4, 3) from `prepare_face_planes` (F padded to chunk).
    Returns:
      face_id: (B, H, W) int32, -1 where background.
      depth: (B, H, W) f32, +inf where background.
    """
    B, F = planes.shape[0], planes.shape[1]
    pad = (-F) % chunk
    if pad:
        kill = jnp.zeros((B, pad, 4, 3), planes.dtype)
        kill = kill.at[:, :, :3, 2].set(-1.0)
        planes = jnp.concatenate([planes, kill], axis=1)
    Fp = planes.shape[1]
    nch = Fp // chunk
    planes = planes.reshape(B, nch, chunk, 4, 3)

    xs = jnp.arange(img_w, dtype=planes.dtype) + 0.5   # (W,)
    ys = jnp.arange(img_h, dtype=planes.dtype) + 0.5   # (H,)

    def body(carry, ch):
        best_z, best_f = carry
        p = planes[:, ch]                                   # (B, C, 4, 3)
        # e[b,c,h,w] = cx*x + cy*y + cc
        px = p[..., 0][..., None, None] * xs[None, None, None, :]
        py = p[..., 1][..., None, None] * ys[None, None, :, None]
        vals = px + py + p[..., 2][..., None, None]         # (B, C, 4, H, W)
        cov = jnp.all(vals[:, :, :3] >= 0, axis=2)          # (B, C, H, W)
        zed = jnp.where(cov, vals[:, :, 3], jnp.inf)        # (B, C, H, W)
        zmin = jnp.min(zed, axis=1)                         # (B, H, W)
        amin = jnp.argmin(zed, axis=1).astype(jnp.int32) + ch * chunk
        better = zmin < best_z
        return (jnp.where(better, zmin, best_z),
                jnp.where(better, amin, best_f)), None

    init = (jnp.full((B, img_h, img_w), jnp.inf, planes.dtype),
            jnp.full((B, img_h, img_w), -1, jnp.int32))
    (best_z, best_f), _ = jax.lax.scan(body, init, jnp.arange(nch))
    return best_f, best_z


def face_ids_to_parts(face_id: jnp.ndarray, face_parts: jnp.ndarray) -> jnp.ndarray:
    """face-id map -> body-part map (0 = background).

    Replaces the colour-cube decode of `renderers/nmr_renderer.py:93-101`
    with a single gather on a static per-face attribute.
    """
    fg = face_id >= 0
    safe = jnp.maximum(face_id, 0)
    return jnp.where(fg, face_parts[safe], 0).astype(jnp.int32)
