"""Hot-path kernels and native ops, gathered under one surface.

The actual implementations live with their subsystems; this package is the
kernel inventory:

- Pallas TPU rasteriser: `straps_tpu.render.pallas_raster`
- XLA rasteriser (portable): `straps_tpu.render.raster`
- Detection ops (NMS / ROIAlign / bilinear sampling): `straps_tpu.perception.ops`
- Differentiable soft silhouette: `straps_tpu.render.soft_silhouette`
- Native host IO (C++ mmap npy / threaded batch load / shuffle):
  `straps_tpu.data.native_io` over `native/straps_io.cpp`
"""

from straps_tpu.render.pallas_raster import rasterize_pallas, FACE_CHUNK
from straps_tpu.render.raster import rasterize_xla, prepare_face_planes
from straps_tpu.render.soft_silhouette import soft_silhouette
from straps_tpu.perception.ops import (
    nms_fixed, roi_align, multilevel_roi_align, bilinear_sample,
    pairwise_iou, encode_boxes, decode_boxes,
)
from straps_tpu.data.native_io import load_npy_batch, shuffled_indices, mmap_npy

__all__ = [
    "rasterize_pallas", "FACE_CHUNK", "rasterize_xla", "prepare_face_planes",
    "soft_silhouette", "nms_fixed", "roi_align", "multilevel_roi_align",
    "bilinear_sample", "pairwise_iou", "encode_boxes", "decode_boxes",
    "load_npy_batch", "shuffled_indices", "mmap_npy",
]
