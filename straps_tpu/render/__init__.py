"""TPU-first mesh rasterisation (part segmentation + silhouettes)."""

from straps_tpu.render.raster import (
    project_to_screen, prepare_face_planes, face_chunk_row_bounds,
    rasterize_xla, face_ids_to_parts,
)
from straps_tpu.render.pallas_raster import rasterize_pallas, FACE_CHUNK
from straps_tpu.render.renderer import (
    render_part_seg, render_silhouette, render_rgb, default_raster_backend,
)

__all__ = [
    "project_to_screen", "prepare_face_planes", "face_chunk_row_bounds",
    "rasterize_xla", "face_ids_to_parts", "rasterize_pallas", "FACE_CHUNK",
    "render_part_seg", "render_silhouette", "render_rgb",
    "default_raster_backend",
]
