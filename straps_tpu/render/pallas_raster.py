"""Fused Pallas TPU rasteriser.

One kernel instance owns a (ROWS x W) pixel strip of one batch element and
loops over face chunks held in VMEM, evaluating the 4 affine plane functions
(3 edges + depth, prepared by `straps_tpu.render.raster.prepare_face_planes`)
as (chunk x W) VPU broadcast tiles per row with a running min-depth /
face-id kept in the output VMEM blocks.  Face chunks whose projected
y-range misses the strip are skipped via `pl.when` (per-chunk bounds
precomputed on device; spatially coherent face order keeps them tight).

Compared to the XLA scan path this keeps the (faces x pixels) intermediates
entirely in VMEM/registers — zero HBM traffic beyond planes in + id/depth
maps out — which is the whole game on a bandwidth-bound op.

Tiling notes (v5e): per-row evaluation with a static 8-row unroll and
static-index VMEM writes is the fast configuration; chunk=128 keeps the
unrolled (chunk, W) temporaries within the 16MB scoped-VMEM budget
(chunk=256 OOMs at ~18MB; dynamic-row writes or a lane-flattened
cond/carry loop are 2-10x slower).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tunables: face chunk size (sublane dim) and pixel rows per kernel instance.
FACE_CHUNK = 128
ROWS_PER_BLOCK = 8


def _raster_kernel(bounds_ref, planes_ref, fid_ref, z_ref, *,
                   img_w: int, num_chunks: int, rows: int, chunk: int):
    rb = pl.program_id(1)
    y0 = rb * rows

    # Pixel-centre x coordinates, broadcast row vector (1, W).
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, img_w), 1).astype(
        jnp.float32) + 0.5

    big = jnp.float32(3.4e38)
    fid_ref[0] = jnp.full((rows, img_w), -1, jnp.int32)
    z_ref[0] = jnp.full((rows, img_w), big, jnp.float32)

    def chunk_body(c, _):
        lo = bounds_ref[0, c, 0]
        hi = bounds_ref[0, c, 1]

        @pl.when((lo < y0 + rows) & (hi > y0))
        def _():
            blk = planes_ref[0, pl.ds(c * chunk, chunk), :]   # (C, 12)
            e0x, e0y, e0c = blk[:, 0:1], blk[:, 1:2], blk[:, 2:3]
            e1x, e1y, e1c = blk[:, 3:4], blk[:, 4:5], blk[:, 5:6]
            e2x, e2y, e2c = blk[:, 6:7], blk[:, 7:8], blk[:, 8:9]
            zx, zy, zc = blk[:, 9:10], blk[:, 10:11], blk[:, 11:12]
            e0xx = e0x * xs                                    # (C, W)
            e1xx = e1x * xs
            e2xx = e2x * xs
            zxx = zx * xs
            for r in range(rows):                              # static unroll
                y = (y0 + r).astype(jnp.float32) + 0.5
                cov = ((e0xx + (e0y * y + e0c) >= 0)
                       & (e1xx + (e1y * y + e1c) >= 0)
                       & (e2xx + (e2y * y + e2c) >= 0))        # (C, W)
                zval = zxx + (zy * y + zc)
                zed = jnp.where(cov, zval, big)
                zmin = jnp.min(zed, axis=0, keepdims=True)     # (1, W)
                amin = jnp.argmin(zed, axis=0).astype(jnp.int32)[None, :]
                better = zmin < z_ref[0, r:r + 1, :]
                z_ref[0, r:r + 1, :] = jnp.where(better, zmin,
                                                 z_ref[0, r:r + 1, :])
                fid_ref[0, r:r + 1, :] = jnp.where(
                    better, amin + c * chunk, fid_ref[0, r:r + 1, :])

        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


@functools.partial(jax.jit, static_argnames=("img_h", "img_w", "interpret"))
def rasterize_pallas(planes: jnp.ndarray, bounds: jnp.ndarray,
                     img_h: int, img_w: int,
                     interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rasterise plane-form faces to (face_id, depth) maps.

    Args:
      planes: (B, F, 4, 3) from `prepare_face_planes`; F padded internally.
      bounds: (B, num_chunks, 2) int32 row bounds from
        `face_chunk_row_bounds*` with chunk=FACE_CHUNK.
      img_h, img_w: output size (img_w should be a multiple of 128).
      interpret: run in Pallas interpreter mode (for CPU tests).
    Returns:
      face_id (B, H, W) int32 (-1 = background), depth (B, H, W) f32.
    """
    B, F = planes.shape[0], planes.shape[1]
    pad = (-F) % FACE_CHUNK
    if pad:
        kill = jnp.zeros((B, pad, 4, 3), planes.dtype)
        kill = kill.at[:, :, :3, 2].set(-1.0)
        planes = jnp.concatenate([planes, kill], axis=1)
    Fp = planes.shape[1]
    num_chunks = Fp // FACE_CHUNK
    assert bounds.shape[1] == num_chunks, (bounds.shape, num_chunks)
    flat = planes.reshape(B, Fp, 12)

    grid = (B, img_h // ROWS_PER_BLOCK)
    kernel = functools.partial(_raster_kernel, img_w=img_w,
                               num_chunks=num_chunks, rows=ROWS_PER_BLOCK,
                               chunk=FACE_CHUNK)
    fid, z = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, num_chunks, 2), lambda b, rb: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Fp, 12), lambda b, rb: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, ROWS_PER_BLOCK, img_w), lambda b, rb: (b, rb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS_PER_BLOCK, img_w), lambda b, rb: (b, rb, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, img_h, img_w), jnp.int32),
            jax.ShapeDtypeStruct((B, img_h, img_w), jnp.float32),
        ),
        interpret=interpret,
    )(bounds, flat)
    return fid, z
