"""Rasteriser kernel design-space round 2 — measure candidate variants on
the real TPU and print a table (extends docs/KERNEL_NOTES.md; winner gets
ported into straps_tpu/render/pallas_raster.py).

Variants over the committed chunk=128 / 8-row-unroll kernel:
  base        committed round-1 kernel (library import)
  minedge     coverage via min(e0,e1,e2) >= 0  (3 ops instead of 5)
  batched     assemble (rows, W) zmin/amin, single masked ref update
  rows16/32   taller strips (amortise per-chunk fixed work; coarser culling)
  bf16z       depth plane in bfloat16 (z recentred per image so bf16
              resolution ~0.008 units; edges stay f32)

Usage: python benchmarks/raster_variants.py [batch] [variant ...]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACE_CHUNK = 128


def make_kernel(img_w, num_chunks, rows, chunk, minedge=False,
                batched=False, zdtype="float32"):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(bounds_ref, planes_ref, fid_ref, z_ref):
        rb = pl.program_id(1)
        y0 = rb * rows
        xs = jax.lax.broadcasted_iota(jnp.int32, (1, img_w), 1).astype(
            jnp.float32) + 0.5
        big = jnp.float32(3.4e38)
        zbig = jnp.asarray(big, zdtype) if zdtype == "float32" else \
            jnp.asarray(3.0e38, jnp.bfloat16)
        fid_ref[0] = jnp.full((rows, img_w), -1, jnp.int32)
        z_ref[0] = jnp.full((rows, img_w), zbig, z_ref.dtype)

        def chunk_body(c, _):
            lo = bounds_ref[0, c, 0]
            hi = bounds_ref[0, c, 1]

            @pl.when((lo < y0 + rows) & (hi > y0))
            def _():
                blk = planes_ref[0, pl.ds(c * chunk, chunk), :]
                e0x, e0y, e0c = blk[:, 0:1], blk[:, 1:2], blk[:, 2:3]
                e1x, e1y, e1c = blk[:, 3:4], blk[:, 4:5], blk[:, 5:6]
                e2x, e2y, e2c = blk[:, 6:7], blk[:, 7:8], blk[:, 8:9]
                zx, zy, zc = blk[:, 9:10], blk[:, 10:11], blk[:, 11:12]
                e0xx = e0x * xs
                e1xx = e1x * xs
                e2xx = e2x * xs
                if zdtype == "bfloat16":
                    zxx = (zx * xs).astype(jnp.bfloat16)
                else:
                    zxx = zx * xs
                row_z, row_f = [], []
                for r in range(rows):
                    y = (y0 + r).astype(jnp.float32) + 0.5
                    e0 = e0xx + (e0y * y + e0c)
                    e1 = e1xx + (e1y * y + e1c)
                    e2 = e2xx + (e2y * y + e2c)
                    if minedge:
                        cov = jnp.minimum(jnp.minimum(e0, e1), e2) >= 0
                    else:
                        cov = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
                    if zdtype == "bfloat16":
                        zval = zxx + (zy * y + zc).astype(jnp.bfloat16)
                    else:
                        zval = zxx + (zy * y + zc)
                    zed = jnp.where(cov, zval, zbig)
                    zmin = jnp.min(zed, axis=0, keepdims=True)
                    amin = jnp.argmin(zed, axis=0).astype(jnp.int32)[None, :]
                    if batched:
                        row_z.append(zmin)
                        row_f.append(amin + c * chunk)
                    else:
                        better = zmin < z_ref[0, r:r + 1, :]
                        z_ref[0, r:r + 1, :] = jnp.where(
                            better, zmin, z_ref[0, r:r + 1, :])
                        fid_ref[0, r:r + 1, :] = jnp.where(
                            better, amin + c * chunk, fid_ref[0, r:r + 1, :])
                if batched:
                    zblk = jnp.concatenate(row_z, axis=0)      # (rows, W)
                    fblk = jnp.concatenate(row_f, axis=0)
                    better = zblk < z_ref[0]
                    z_ref[0] = jnp.where(better, zblk, z_ref[0])
                    fid_ref[0] = jnp.where(better, fblk, fid_ref[0])

            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

    return kernel


def make_packed_kernel(img_w, num_chunks, rows, chunk):
    """Single-output packed kernel: min over (depth-bits & ~7) | part."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(bounds_ref, planes_ref, packed_ref):
        rb = pl.program_id(1)
        y0 = rb * rows
        xs = jax.lax.broadcasted_iota(jnp.int32, (1, img_w), 1).astype(
            jnp.float32) + 0.5
        # Python-constant bitcast: Mosaic's tpu.bitcast only accepts vectors
        # (rank-0 f32 -> 'operand #0 must be vector' VerificationError).
        import numpy as _np
        INIT = int(_np.float32(3.4e38).view(_np.int32)) & ~7
        packed_ref[0] = jnp.full((rows, img_w), INIT, jnp.int32)

        def chunk_body(c, _):
            lo = bounds_ref[0, c, 0]
            hi = bounds_ref[0, c, 1]

            @pl.when((lo < y0 + rows) & (hi > y0))
            def _():
                blk = planes_ref[0, pl.ds(c * chunk, chunk), :]
                e0x, e0y, e0c = blk[:, 0:1], blk[:, 1:2], blk[:, 2:3]
                e1x, e1y, e1c = blk[:, 3:4], blk[:, 4:5], blk[:, 5:6]
                e2x, e2y, e2c = blk[:, 6:7], blk[:, 7:8], blk[:, 8:9]
                zx, zy, zc = blk[:, 9:10], blk[:, 10:11], blk[:, 11:12]
                attr = blk[:, 12:13].astype(jnp.int32)          # (C, 1)
                e0xx = e0x * xs
                e1xx = e1x * xs
                e2xx = e2x * xs
                zxx = zx * xs
                rows_out = []
                for r in range(rows):
                    y = (y0 + r).astype(jnp.float32) + 0.5
                    e0 = e0xx + (e0y * y + e0c)
                    e1 = e1xx + (e1y * y + e1c)
                    e2 = e2xx + (e2y * y + e2c)
                    cov = jnp.minimum(jnp.minimum(e0, e1), e2) >= 0
                    zval = zxx + (zy * y + zc)
                    pk = (jax.lax.bitcast_convert_type(zval, jnp.int32)
                          & ~jnp.int32(7)) | attr
                    pk = jnp.where(cov, pk, INIT)
                    rows_out.append(jnp.min(pk, axis=0, keepdims=True))
                blkmin = jnp.concatenate(rows_out, axis=0)
                packed_ref[0] = jnp.minimum(packed_ref[0], blkmin)

            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

    return kernel


def make_packed_kernel_T(img_w, num_chunks, rows, chunk):
    """Packed kernel over a TRANSPOSED (16, Fp) planes layout
    (KERNEL_NOTES 'remaining headroom': the row-major (Fp, 16) layout pads
    lanes 16 -> 128 in VMEM (~7MB resident); transposed it is ~0.9MB, at
    the cost of one (16, C) -> (C, 16) in-kernel transpose per live chunk)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(bounds_ref, planes_ref, packed_ref):
        rb = pl.program_id(1)
        y0 = rb * rows
        xs = jax.lax.broadcasted_iota(jnp.int32, (1, img_w), 1).astype(
            jnp.float32) + 0.5
        import numpy as _np
        INIT = int(_np.float32(3.4e38).view(_np.int32)) & ~7
        packed_ref[0] = jnp.full((rows, img_w), INIT, jnp.int32)

        def chunk_body(c, _):
            lo = bounds_ref[0, c, 0]
            hi = bounds_ref[0, c, 1]

            @pl.when((lo < y0 + rows) & (hi > y0))
            def _():
                blk = planes_ref[0, :, pl.ds(c * chunk, chunk)].T  # (C, 16)
                e0x, e0y, e0c = blk[:, 0:1], blk[:, 1:2], blk[:, 2:3]
                e1x, e1y, e1c = blk[:, 3:4], blk[:, 4:5], blk[:, 5:6]
                e2x, e2y, e2c = blk[:, 6:7], blk[:, 7:8], blk[:, 8:9]
                zx, zy, zc = blk[:, 9:10], blk[:, 10:11], blk[:, 11:12]
                attr = blk[:, 12:13].astype(jnp.int32)          # (C, 1)
                e0xx = e0x * xs
                e1xx = e1x * xs
                e2xx = e2x * xs
                zxx = zx * xs
                rows_out = []
                for r in range(rows):
                    y = (y0 + r).astype(jnp.float32) + 0.5
                    e0 = e0xx + (e0y * y + e0c)
                    e1 = e1xx + (e1y * y + e1c)
                    e2 = e2xx + (e2y * y + e2c)
                    cov = jnp.minimum(jnp.minimum(e0, e1), e2) >= 0
                    zval = zxx + (zy * y + zc)
                    pk = (jax.lax.bitcast_convert_type(zval, jnp.int32)
                          & ~jnp.int32(7)) | attr
                    pk = jnp.where(cov, pk, INIT)
                    rows_out.append(jnp.min(pk, axis=0, keepdims=True))
                blkmin = jnp.concatenate(rows_out, axis=0)
                packed_ref[0] = jnp.minimum(packed_ref[0], blkmin)

            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

    return kernel


def build_packed_T(planes, bounds, img_h, img_w, face_parts, rows=8,
                   chunk=FACE_CHUNK):
    """Transposed-layout packed variant: planes stored (B, 16, Fp)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, F = planes.shape[0], planes.shape[1]
    pad = (-F) % chunk
    if pad:
        kill = jnp.zeros((B, pad, 4, 3), planes.dtype)
        kill = kill.at[:, :, :3, 2].set(-1.0)
        planes = jnp.concatenate([planes, kill], axis=1)
    Fp = planes.shape[1]
    num_chunks = Fp // chunk
    assert bounds.shape[1] == num_chunks, (bounds.shape, num_chunks)
    flat = planes.reshape(B, Fp, 12)
    attr = jnp.zeros((Fp,), jnp.float32).at[:F].set(
        jnp.asarray(face_parts, jnp.float32))
    attr = jnp.broadcast_to(attr[None, :, None], (B, Fp, 1))
    flat = jnp.concatenate([flat, attr,
                            jnp.zeros((B, Fp, 3), planes.dtype)], axis=-1)
    flat_t = flat.transpose(0, 2, 1)                    # (B, 16, Fp)
    grid = (B, img_h // rows)
    kernel = make_packed_kernel_T(img_w, num_chunks, rows, chunk)

    @jax.jit
    def run(bounds, flat_t):
        packed = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, num_chunks, 2), lambda b, rb: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 16, Fp), lambda b, rb: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows, img_w), lambda b, rb: (b, rb, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, img_h, img_w), jnp.int32),
        )(bounds, flat_t)
        parts = packed & 7
        depth = jax.lax.bitcast_convert_type(packed & ~jnp.int32(7),
                                             jnp.float32)
        return parts, depth

    return run, bounds, flat_t


def build_packed(planes, bounds, img_h, img_w, face_parts, rows=8,
                 chunk=FACE_CHUNK):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, F = planes.shape[0], planes.shape[1]
    pad = (-F) % chunk
    if pad:
        kill = jnp.zeros((B, pad, 4, 3), planes.dtype)
        kill = kill.at[:, :, :3, 2].set(-1.0)
        planes = jnp.concatenate([planes, kill], axis=1)
    Fp = planes.shape[1]
    num_chunks = Fp // chunk
    assert bounds.shape[1] == num_chunks, (bounds.shape, num_chunks)
    flat = planes.reshape(B, Fp, 12)
    attr = jnp.zeros((Fp,), jnp.float32).at[:F].set(
        jnp.asarray(face_parts, jnp.float32))
    attr = jnp.broadcast_to(attr[None, :, None], (B, Fp, 1))
    flat = jnp.concatenate([flat, attr,
                            jnp.zeros((B, Fp, 3), planes.dtype)], axis=-1)
    grid = (B, img_h // rows)
    kernel = make_packed_kernel(img_w, num_chunks, rows, chunk)

    @jax.jit
    def run(bounds, flat):
        packed = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, num_chunks, 2), lambda b, rb: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, Fp, 16), lambda b, rb: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows, img_w), lambda b, rb: (b, rb, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, img_h, img_w), jnp.int32),
        )(bounds, flat)
        parts = packed & 7
        depth = jax.lax.bitcast_convert_type(packed & ~jnp.int32(7),
                                             jnp.float32)
        return parts, depth

    return run, bounds, flat


def build_variant(planes, bounds, img_h, img_w, rows=8, minedge=False,
                  batched=False, zdtype="float32"):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, F = planes.shape[0], planes.shape[1]
    pad = (-F) % FACE_CHUNK
    if pad:
        kill = jnp.zeros((B, pad, 4, 3), planes.dtype)
        kill = kill.at[:, :, :3, 2].set(-1.0)
        planes = jnp.concatenate([planes, kill], axis=1)
    Fp = planes.shape[1]
    num_chunks = Fp // FACE_CHUNK
    flat = planes.reshape(B, Fp, 12)
    grid = (B, img_h // rows)
    kernel = make_kernel(img_w, num_chunks, rows, FACE_CHUNK,
                         minedge=minedge, batched=batched, zdtype=zdtype)
    zj = jnp.float32 if zdtype == "float32" else jnp.bfloat16

    @jax.jit
    def run(bounds, flat):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, num_chunks, 2), lambda b, rb: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, Fp, 12), lambda b, rb: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, rows, img_w), lambda b, rb: (b, rb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows, img_w), lambda b, rb: (b, rb, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, img_h, img_w), jnp.int32),
                jax.ShapeDtypeStruct((B, img_h, img_w), zj),
            ),
        )(bounds, flat)

    return run, bounds, flat


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 140
    only = set(sys.argv[2:])
    import jax
    # Persistent compile cache: each Pallas variant otherwise pays a full
    # remote compile (~minutes) on every sweep invocation.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    from straps_tpu.geometry import get_intrinsics_matrix
    from straps_tpu.render.raster import (
        project_to_screen, prepare_face_planes, face_chunk_row_bounds,
    )
    from straps_tpu.render.pallas_raster import rasterize_pallas
    from straps_tpu.smpl import load_synthetic_assets, smpl_forward

    assets = load_synthetic_assets()
    rng = np.random.RandomState(0)
    shape = jnp.asarray(rng.randn(batch, 10).astype(np.float32) * 0.5)
    verts = smpl_forward(assets, shape).vertices
    cam_t = jnp.tile(jnp.asarray([[0.0, 0.2, 42.0]]), (batch, 1))
    K = jnp.asarray(get_intrinsics_matrix(256, 256, 5000.0))
    screen, z = project_to_screen(verts, cam_t, K)
    planes = prepare_face_planes(screen, z, assets.faces).planes
    bounds = face_chunk_row_bounds(screen, assets.faces, FACE_CHUNK, 256)

    # `cullall`: re-sweep every variant on backface-CULLED planes/bounds
    # (round 5) — culling changes the band geometry, so the r3 tile-point
    # conclusions deserve a re-check under it.
    dead_all = None
    if "cullall" in only:
        only.discard("cullall")
        from straps_tpu.render.raster import backface_mask, kill_faces
        dead_all = backface_mask(screen, assets.faces)
        planes = kill_faces(planes, dead_all)
        bounds = face_chunk_row_bounds(screen, assets.faces, FACE_CHUNK,
                                       256, dead_mask=dead_all)
        print(f"[cullall: {float(np.asarray(dead_all).mean()):.2f} faces "
              "dead]")

    def timeit(fn, *args, n=20):
        out = fn(*args)
        _ = np.asarray(out[0][:1, :1, :1])   # host-pull barrier
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _ = np.asarray(out[0][:1, :1, :1])
        return (time.perf_counter() - t0) / n * 1e3

    # Reference output for correctness.
    ref_fid, ref_z = rasterize_pallas(planes, bounds, 256, 256)
    ref_fid = np.asarray(ref_fid)
    t = timeit(lambda p, b: rasterize_pallas(p, b, 256, 256), planes, bounds)
    print(f"{'base fid (committed)':28s} {t:7.1f} ms")

    ref_parts, _ = rasterize_pallas(planes, bounds, 256, 256,
                                    face_attr=assets.face_parts)
    t = timeit(lambda p, b: rasterize_pallas(p, b, 256, 256,
                                             face_attr=assets.face_parts),
               planes, bounds)
    print(f"{'attr packed (committed)':28s} {t:7.1f} ms")

    # Backface culling A/B (VERDICT r5 stretch): same committed kernel, but
    # back faces killed and excluded from the row bounds — wins only as much
    # as the per-chunk bands actually shrink.
    if not only or "cull" in only:
        from straps_tpu.render.raster import backface_mask, kill_faces
        dead = backface_mask(screen, assets.faces)
        planes_c = kill_faces(planes, dead)
        bounds_c = face_chunk_row_bounds(screen, assets.faces, FACE_CHUNK,
                                         256, dead_mask=dead)
        span = lambda b: float(np.maximum(  # noqa: E731
            np.asarray(b[..., 1]) - np.asarray(b[..., 0]), 0).mean())
        pc, _ = rasterize_pallas(planes_c, bounds_c, 256, 256,
                                 face_attr=assets.face_parts)
        agree = float((np.asarray(pc) == np.asarray(ref_parts)).mean())
        t = timeit(lambda p, b: rasterize_pallas(
            p, b, 256, 256, face_attr=assets.face_parts), planes_c, bounds_c)
        print(f"{'attr packed + backface cull':28s} {t:7.1f} ms   "
              f"parts agreement {agree:.5f}  "
              f"(dead {float(np.asarray(dead).mean()):.2f}, band rows "
              f"{span(bounds):.1f} -> {span(bounds_c):.1f})")

    bounds256 = face_chunk_row_bounds(screen, assets.faces, 256, 256,
                                      dead_mask=dead_all)
    packed_variants = {
        "packed": dict(),
        "packed_rows16": dict(rows=16),
        "packed_rows32": dict(rows=32),
        "packed_chunk256": dict(chunk=256),
        "packed_rows16_chunk256": dict(rows=16, chunk=256),
    }
    for name, kw in packed_variants.items():
        if only and name not in only and "packed" not in only:
            continue
        try:
            b_in = bounds256 if kw.get("chunk") == 256 else bounds
            runp, b_, f_ = build_packed(planes, b_in, 256, 256,
                                        assets.face_parts, **kw)
            pp, dz = runp(b_, f_)
            agree = float((np.asarray(pp) == np.asarray(ref_parts)).mean())
            t = timeit(runp, b_, f_)
            print(f"{name:28s} {t:7.1f} ms   parts agreement {agree:.5f}")
        except Exception as e:  # noqa
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:300]}")

    # Transposed (16, Fp) planes layout (VERDICT r2 #5): ~10x lower VMEM
    # residency; re-sweeps the tile points that OOM'd row-major.
    packed_t_variants = {
        "packedT": dict(),
        "packedT_rows16": dict(rows=16),
        "packedT_rows32": dict(rows=32),
        "packedT_chunk256": dict(chunk=256),
        "packedT_rows16_chunk256": dict(rows=16, chunk=256),
    }
    for name, kw in packed_t_variants.items():
        if only and name not in only and "packedT" not in only:
            continue
        try:
            b_in = bounds256 if kw.get("chunk") == 256 else bounds
            runp, b_, f_ = build_packed_T(planes, b_in, 256, 256,
                                          assets.face_parts, **kw)
            pp, dz = runp(b_, f_)
            agree = float((np.asarray(pp) == np.asarray(ref_parts)).mean())
            t = timeit(runp, b_, f_)
            print(f"{name:28s} {t:7.1f} ms   parts agreement {agree:.5f}")
        except Exception as e:  # noqa
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:300]}")

    variants = {
        "minedge": dict(minedge=True),
        "batched": dict(batched=True),
        "minedge+batched": dict(minedge=True, batched=True),
        "rows16": dict(rows=16),
        "rows32": dict(rows=32),
        "minedge+rows16": dict(minedge=True, rows=16),
        "bf16z": dict(zdtype="bfloat16"),
        "minedge+bf16z+rows16": dict(minedge=True, zdtype="bfloat16",
                                     rows=16),
    }
    for name, kw in variants.items():
        if only and name not in only:
            continue
        try:
            run, b_, f_ = build_variant(planes, bounds, 256, 256, **kw)
            fid, z = run(b_, f_)
            agree = float((np.asarray(fid) == ref_fid).mean())
            t = timeit(run, b_, f_)
            print(f"{name:28s} {t:7.1f} ms   fid agreement {agree:.5f}")
        except Exception as e:  # noqa
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
