"""High-level batch renderer: vertices + camera -> body-part segmentation.

Drop-in equivalent of the reference `NMRRenderer` in part-segmentation mode
(`renderers/nmr_renderer.py:76-101`): same perspective camera convention and
the 6-part output labelling of `renderers/nmr_renderer.py:13-20`, built on
the plane-form rasteriser (XLA scan or fused Pallas kernel).
"""

from typing import Optional, Tuple

import jax.numpy as jnp

from straps_tpu.render.raster import (
    project_to_screen, prepare_face_planes, face_chunk_row_bounds,
    rasterize_xla, face_ids_to_parts, backface_mask, kill_faces,
)
from straps_tpu.render.pallas_raster import rasterize_pallas, FACE_CHUNK


def render_part_seg(verts: jnp.ndarray, cam_t: jnp.ndarray, cam_K: jnp.ndarray,
                    faces: jnp.ndarray, face_parts: jnp.ndarray, img_wh: int,
                    cam_R: Optional[jnp.ndarray] = None,
                    backend: str = "pallas",
                    interpret: bool = False,
                    cull_backfaces: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render a batch of meshes to part-id maps.

    Args:
      verts: (B, V, 3) model-space vertices.
      cam_t: (B, 3) camera translation.
      cam_K: (3, 3) intrinsics.
      faces: (F, 3) int32 triangle indices.
      face_parts: (F,) int32 part id per face.
      img_wh: square output size.
      backend: "pallas" (TPU kernel) or "xla" (portable scan).
      interpret: Pallas interpreter mode (CPU testing).
      cull_backfaces: kill back-facing faces and drop them from the chunk
        row bounds — output-identical on the watertight SMPL mesh (see
        `backface_mask`), lets the kernel skip all-backface chunks.
    Returns:
      parts: (B, img_wh, img_wh) int32 part map (0 = background).
      depth: (B, img_wh, img_wh) f32 view depth (+big where background).
    """
    screen, z = project_to_screen(verts, cam_t, cam_K, cam_R)
    planes = prepare_face_planes(screen, z, faces).planes
    dead = None
    if cull_backfaces:
        dead = backface_mask(screen, faces)
        planes = kill_faces(planes, dead)
    if backend == "pallas":
        # Chunk y-bound culling relies on the mesh's spatial coherence
        # (neighbouring faces share vertices, so original-order chunks span
        # narrow y ranges).  A runtime ymin argsort would tighten bounds
        # further but jnp.argsort at this shape faults the axon v5e runtime;
        # `sort_faces_by_ymin` is kept for future use.
        bounds = face_chunk_row_bounds(screen, faces, FACE_CHUNK, img_wh,
                                       dead_mask=dead)
        # Body-part lookup happens INSIDE the kernel (face_attr): the
        # post-kernel XLA gather at (B, H, W) measured 67 ms at B=140 —
        # as much as the rasterisation itself.
        parts, depth = rasterize_pallas(planes, bounds, img_wh, img_wh,
                                        interpret=interpret,
                                        face_attr=face_parts)
        return parts, depth
    elif backend == "xla":
        fid, depth = rasterize_xla(planes, img_wh, img_wh)
    else:
        raise ValueError(f"unknown backend {backend!r}")
    parts = face_ids_to_parts(fid, face_parts)
    return parts, depth


def render_rgb(verts: jnp.ndarray, cam_t: jnp.ndarray, cam_K: jnp.ndarray,
               faces: jnp.ndarray, face_colors: jnp.ndarray, img_wh: int,
               cam_R: Optional[jnp.ndarray] = None, backend: str = "pallas",
               interpret: bool = False):
    """Flat-shaded RGB render + depth — the NMRRenderer RGB mode surface
    (`renderers/nmr_renderer.py:88-91`: ambient-lit per-face texture).

    Args:
      face_colors: (F, 3) per-face RGB in [0, 1].
    Returns:
      rgb (B, H, W, 3) with background black, depth (B, H, W).
    """
    screen, z = project_to_screen(verts, cam_t, cam_K, cam_R)
    planes = prepare_face_planes(screen, z, faces).planes
    if backend == "pallas":
        bounds = face_chunk_row_bounds(screen, faces, FACE_CHUNK, img_wh)
        fid, depth = rasterize_pallas(planes, bounds, img_wh, img_wh,
                                      interpret=interpret)
        fg = fid >= 0
        rgb = face_colors[jnp.maximum(fid, 0)]
    else:
        fid, depth = rasterize_xla(planes, img_wh, img_wh)
        fg = fid >= 0
        rgb = face_colors[jnp.maximum(fid, 0)]
    return rgb * fg[..., None], depth


def default_raster_backend(img_wh: int) -> str:
    """Pick the rasteriser backend for the CURRENT jax default device:
    'pallas' (the fused TPU kernel — ~10x less live memory than the XLA
    scan and faster) on accelerators for row-aligned sizes, 'xla' on CPU
    (where Pallas would need slow interpret mode) and for img_wh not a
    multiple of the kernel's 8-row strip."""
    import jax
    if jax.default_backend() == "cpu" or img_wh % 8:
        return "xla"
    return "pallas"


def render_silhouette(verts, cam_t, cam_K, faces, img_wh,
                      cam_R=None, backend="pallas", interpret=False,
                      cull_backfaces=False):
    """Binary silhouette render (part map != 0)."""
    ones = jnp.ones((faces.shape[0],), jnp.int32)
    parts, depth = render_part_seg(verts, cam_t, cam_K, faces, ones, img_wh,
                                   cam_R=cam_R, backend=backend,
                                   interpret=interpret,
                                   cull_backfaces=cull_backfaces)
    return (parts > 0).astype(jnp.float32), depth
