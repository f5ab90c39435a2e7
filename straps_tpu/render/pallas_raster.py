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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tunables: face chunk size (sublane dim) and pixel rows per kernel instance.
FACE_CHUNK = 128
ROWS_PER_BLOCK = 8

# Attribute mode packs the per-face attribute into the cleared low mantissa
# bits of the f32 depth (bitcast is order-preserving for positive floats), so
# ONE int32 min-reduction yields depth+attribute together — no argmin, no
# one-hot contraction, and half the output VMEM/HBM traffic.  Constraints:
# attr in [0, 2**ATTR_BITS), depths > 0 (always true for in-front-of-camera
# geometry).  Depth quantisation is <= 2**ATTR_BITS ulps (~4e-5 at z~40);
# z-ties within that window resolve to the smaller attribute id.  Measured
# 76.6 -> 64.0 ms at B=140 256^2 (benchmarks/raster_variants.py, round 2).
ATTR_BITS = 3
_ATTR_MASK = (1 << ATTR_BITS) - 1
# Python-constant bitcast for the background init: Mosaic's tpu.bitcast only
# accepts vectors (a rank-0 f32 bitcast is a VerificationError).
_PACKED_INIT = int(np.float32(3.4e38).view(np.int32)) & ~_ATTR_MASK


def _raster_kernel(bounds_ref, planes_ref, fid_ref, z_ref, *,
                   img_w: int, num_chunks: int, rows: int, chunk: int):
    """Face-id mode: planes cols 0..11; outputs = (face-id map, depth map)."""
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
            row_z, row_f = [], []
            for r in range(rows):                              # static unroll
                y = (y0 + r).astype(jnp.float32) + 0.5
                # Coverage via min-of-edges (one compare instead of three
                # compares + two ands — measured win, KERNEL_NOTES round 2).
                e0 = e0xx + (e0y * y + e0c)
                e1 = e1xx + (e1y * y + e1c)
                e2 = e2xx + (e2y * y + e2c)
                cov = jnp.minimum(jnp.minimum(e0, e1), e2) >= 0   # (C, W)
                zval = zxx + (zy * y + zc)
                zed = jnp.where(cov, zval, big)
                row_z.append(jnp.min(zed, axis=0, keepdims=True))  # (1, W)
                amin = jnp.argmin(zed, axis=0).astype(jnp.int32)[None, :]
                row_f.append(amin + c * chunk)
            # One (rows, W) masked update per chunk instead of `rows`
            # separate single-sublane read-modify-writes.
            zblk = jnp.concatenate(row_z, axis=0)
            fblk = jnp.concatenate(row_f, axis=0)
            better = zblk < z_ref[0]
            z_ref[0] = jnp.where(better, zblk, z_ref[0])
            fid_ref[0] = jnp.where(better, fblk, fid_ref[0])

        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


def _raster_kernel_packed(bounds_ref, planes_ref, packed_ref, *,
                          img_w: int, num_chunks: int, rows: int, chunk: int):
    """Attribute mode: planes col 12 carries a per-face attribute (body-part
    id) which is OR-ed into the cleared low ATTR_BITS mantissa bits of the
    f32 depth, bitcast to int32.  Because the bitcast of positive floats is
    order-preserving, ONE int32 min per pixel resolves the depth test AND
    the attribute lookup — no argmin, no one-hot, one output map instead of
    two.  Replaces both the post-kernel XLA gather (67 ms at B=140) and the
    round-2 in-kernel one-hot contraction (76.6 -> 64.0 ms)."""
    rb = pl.program_id(1)
    y0 = rb * rows
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, img_w), 1).astype(
        jnp.float32) + 0.5
    packed_ref[0] = jnp.full((rows, img_w), _PACKED_INIT, jnp.int32)

    def chunk_body(c, _):
        lo = bounds_ref[0, c, 0]
        hi = bounds_ref[0, c, 1]

        @pl.when((lo < y0 + rows) & (hi > y0))
        def _():
            blk = planes_ref[0, pl.ds(c * chunk, chunk), :]   # (C, 16)
            e0x, e0y, e0c = blk[:, 0:1], blk[:, 1:2], blk[:, 2:3]
            e1x, e1y, e1c = blk[:, 3:4], blk[:, 4:5], blk[:, 5:6]
            e2x, e2y, e2c = blk[:, 6:7], blk[:, 7:8], blk[:, 8:9]
            zx, zy, zc = blk[:, 9:10], blk[:, 10:11], blk[:, 11:12]
            attr = blk[:, 12:13].astype(jnp.int32)             # (C, 1)
            e0xx = e0x * xs                                    # (C, W)
            e1xx = e1x * xs
            e2xx = e2x * xs
            zxx = zx * xs
            row_p = []
            for r in range(rows):                              # static unroll
                y = (y0 + r).astype(jnp.float32) + 0.5
                e0 = e0xx + (e0y * y + e0c)
                e1 = e1xx + (e1y * y + e1c)
                e2 = e2xx + (e2y * y + e2c)
                cov = jnp.minimum(jnp.minimum(e0, e1), e2) >= 0   # (C, W)
                zval = zxx + (zy * y + zc)
                pk = (jax.lax.bitcast_convert_type(zval, jnp.int32)
                      & ~jnp.int32(_ATTR_MASK)) | attr
                pk = jnp.where(cov, pk, _PACKED_INIT)
                row_p.append(jnp.min(pk, axis=0, keepdims=True))  # (1, W)
            blkmin = jnp.concatenate(row_p, axis=0)
            packed_ref[0] = jnp.minimum(packed_ref[0], blkmin)

        return 0

    jax.lax.fori_loop(0, num_chunks, chunk_body, 0)


@functools.partial(jax.jit, static_argnames=("img_h", "img_w", "interpret"))
def rasterize_pallas(planes: jnp.ndarray, bounds: jnp.ndarray,
                     img_h: int, img_w: int,
                     interpret: bool = False,
                     face_attr: jnp.ndarray = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rasterise plane-form faces to (face_id | attribute, depth) maps.

    Args:
      planes: (B, F, 4, 3) from `prepare_face_planes`; F padded internally.
      bounds: (B, num_chunks, 2) int32 row bounds from
        `face_chunk_row_bounds*` with chunk=FACE_CHUNK.
      img_h, img_w: output size (img_w should be a multiple of 128).
      interpret: run in Pallas interpreter mode (for CPU tests).
      face_attr: optional (F,) int32 per-face attribute (e.g. body-part id,
        background = 0) in [0, 2**ATTR_BITS).  When given, the first output
        is the attribute map — the attribute is packed into the depth's low
        mantissa bits so a single int32 min resolves depth test + lookup
        (see `_raster_kernel_packed`); the returned depth is quantised to
        2**ATTR_BITS ulps and all depths must be positive.
    Returns:
      face_id (B, H, W) int32 (-1 = background) — or the attribute map when
      `face_attr` is given (0 = background) — and depth (B, H, W) f32.
    """
    if img_h % ROWS_PER_BLOCK:
        # The grid covers img_h // ROWS_PER_BLOCK row blocks; a remainder
        # would leave the bottom rows' output block unvisited
        # (uninitialised VMEM) with no error.  (img_w needs no such check:
        # the full width rides one lane-padded block.)
        raise ValueError(f"img_h must be a multiple of {ROWS_PER_BLOCK}, "
                         f"got {img_h} (use the XLA backend for odd sizes)")
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
    with_attr = face_attr is not None
    cols = 12
    if with_attr:
        # Attribute rides as a 13th plane column (padded to 16 lanes; the
        # VMEM tile pads the lane dim anyway, so the extra columns are free
        # on-chip).
        attr = jnp.zeros((Fp,), jnp.float32).at[:F].set(
            face_attr.astype(jnp.float32))
        attr = jnp.broadcast_to(attr[None, :, None], (B, Fp, 1))
        zeros = jnp.zeros((B, Fp, 3), planes.dtype)
        flat = jnp.concatenate([flat, attr, zeros], axis=-1)
        cols = 16

    grid = (B, img_h // ROWS_PER_BLOCK)
    in_specs = [
        pl.BlockSpec((1, num_chunks, 2), lambda b, rb: (b, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, Fp, cols), lambda b, rb: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, ROWS_PER_BLOCK, img_w), lambda b, rb: (b, rb, 0),
                            memory_space=pltpu.VMEM)
    if with_attr:
        kernel = functools.partial(_raster_kernel_packed, img_w=img_w,
                                   num_chunks=num_chunks, rows=ROWS_PER_BLOCK,
                                   chunk=FACE_CHUNK)
        packed = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B, img_h, img_w), jnp.int32),
            interpret=interpret,
        )(bounds, flat)
        attr_map = packed & _ATTR_MASK
        z = jax.lax.bitcast_convert_type(packed & ~jnp.int32(_ATTR_MASK),
                                         jnp.float32)
        return attr_map, z

    kernel = functools.partial(_raster_kernel, img_w=img_w,
                               num_chunks=num_chunks, rows=ROWS_PER_BLOCK,
                               chunk=FACE_CHUNK)
    fid, z = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, img_h, img_w), jnp.int32),
            jax.ShapeDtypeStruct((B, img_h, img_w), jnp.float32),
        ),
        interpret=interpret,
    )(bounds, flat)
    return fid, z
