"""Stage-level timing + roofline accounting of the training step on the
real TPU: synthetic data generation (augment+SMPL+render+crop+heatmaps),
forward+loss, full step.

For each stage the XLA cost model's FLOP / HBM-byte counts
(`compiled.cost_analysis()`) are normalised against the v5e chip peaks to
report achieved TFLOP/s, % of MXU peak, achieved GB/s, % of HBM peak, and
the stage's arithmetic intensity vs the ridge point — i.e. whether the
stage is compute- or bandwidth-bound and how far from its own roof it runs
(the MFU/roofline table in docs/ROOFLINE.md).

Usage: python benchmarks/profile_stages.py [batch] [compute_dtype]
(compute_dtype e.g. bfloat16 — applies to the regressor encoder, stage 4.)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _host_pull(out):
    """Completion barrier: pull one small leaf to the host.  On the tunneled
    axon backend `jax.block_until_ready` can return before enqueued work has
    executed (see bench.py / CLAUDE.md), so a host materialisation of a real
    output is the only reliable barrier."""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[-1]
    return np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])


def timeit(fn, *args, n=10):
    out = fn(*args)
    _host_pull(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _host_pull(out)
    return (time.perf_counter() - t0) / n


# TPU v5e (v5 lite) single-chip peaks (public spec): 197 TFLOP/s bf16 MXU,
# 16 GB HBM at 819 GB/s.  f32 matmuls run as 3x bf16 MXU passes
# (precision="highest" 6x), so the bf16 peak is THE denominator and f32
# stages structurally cap below 1/3 of it.
V5E_PEAK_FLOPS = 197e12
V5E_HBM_BPS = 819e9
RIDGE = V5E_PEAK_FLOPS / V5E_HBM_BPS       # ~240 FLOP/byte


def cost_counts(jitted, *args, **kwargs):
    """(flops, hbm_bytes) from XLA's compiled cost model, or None if the
    backend doesn't expose it (cost_analysis shape differs across jax
    versions: dict or [dict])."""
    try:
        ca = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        nbytes = float(ca.get("bytes accessed", 0.0))
        if flops <= 0 and nbytes <= 0:
            return None
        return flops, nbytes
    except Exception:
        return None


def roofline_row(name, t, counts):
    """One table row: where the stage sits on the v5e roofline."""
    if not counts:
        print(f"  {name:<22s} cost model unavailable")
        return
    flops, nbytes = counts
    tflops = flops / t / 1e12
    gbps = nbytes / t / 1e9
    ai = flops / max(nbytes, 1.0)
    bound = "compute" if ai >= RIDGE else "bandwidth"
    # % of the roof that actually binds this stage at its intensity.
    roof = min(V5E_PEAK_FLOPS, ai * V5E_HBM_BPS)
    print(f"  {name:<22s} {flops / 1e9:9.1f} GFLOP {nbytes / 1e9:8.2f} GB  "
          f"{tflops:7.2f} TF/s ({tflops * 1e12 / V5E_PEAK_FLOPS * 100:5.1f}% "
          f"MXU) {gbps:7.1f} GB/s ({gbps * 1e9 / V5E_HBM_BPS * 100:5.1f}% "
          f"HBM)  AI={ai:6.1f} [{bound}-bound, {flops / t / roof * 100:5.1f}% "
          f"of roof]")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 140
    compute_dtype = sys.argv[2] if len(sys.argv) > 2 else None
    import jax
    import jax.numpy as jnp
    from straps_tpu.config import TrainConfig
    from straps_tpu.geometry import get_intrinsics_matrix, perspective_project
    from straps_tpu.render import render_part_seg
    from straps_tpu.smpl import load_synthetic_assets, smpl_forward
    from straps_tpu.train import build_training, generate_synthetic_batch

    cfg = TrainConfig()
    cfg.batch_size = batch
    assets = load_synthetic_assets()
    rng = np.random.RandomState(0)
    pose = jnp.asarray(rng.randn(batch, 72).astype(np.float32) * 0.2)
    shape = jnp.asarray(rng.randn(batch, 10).astype(np.float32) * 0.5)
    key = jax.random.PRNGKey(0)

    rows = []

    # Stage 1: SMPL forward alone.
    smpl_fn = jax.jit(lambda s: smpl_forward(assets, s))
    t = timeit(smpl_fn, shape)
    print(f"smpl_forward (reposed): {t * 1e3:7.1f} ms")
    rows.append(("smpl_forward", t, cost_counts(smpl_fn, shape)))

    # Stage 2: render alone.
    K = jnp.asarray(get_intrinsics_matrix(256, 256, 5000.0))
    verts = smpl_fn(shape).vertices
    cam_t = jnp.tile(jnp.asarray([[0.0, 0.2, 42.0]]), (batch, 1))
    # cull_backfaces matches the production training render
    # (train/synthetic.py): bit-identical parts, -8.6% time (KERNEL_NOTES
    # round 5).
    rend_fn = jax.jit(lambda v, t_: render_part_seg(
        v, t_, K, assets.faces, assets.face_parts, 256, backend="pallas",
        cull_backfaces=True))
    t = timeit(rend_fn, verts, cam_t)
    print(f"pallas render:          {t * 1e3:7.1f} ms")
    rows.append(("pallas render", t, cost_counts(rend_fn, verts, cam_t)))

    # Stage 3: full synthetic batch generation.
    synth_fn = jax.jit(lambda k, p, s: generate_synthetic_batch(
        k, p, s, assets, cfg, augment=True))
    t = timeit(synth_fn, key, pose, shape)
    print(f"synthetic batch gen:    {t * 1e3:7.1f} ms")
    rows.append(("synthetic batch gen", t, cost_counts(synth_fn, key, pose,
                                                       shape)))

    # Stage 4: full train step.
    if compute_dtype:
        cfg.model.compute_dtype = compute_dtype
    model, assets2, state, tx, train_step, val_step, mesh = build_training(
        cfg, assets)
    t = timeit(lambda: train_step(state, key, pose, shape)[1], n=10)
    tag = f" ({compute_dtype})" if compute_dtype else ""
    print(f"full train step{tag}:        {t * 1e3:7.1f} ms")
    # Lower the EXACT jitted program already timed (assets as arguments),
    # not a fresh jit over the closure — that would bake the ~16 MB assets
    # in as constants (the HTTP-413 class CLAUDE.md forbids) and pay a
    # second, cache-missing full train-step compile just for flop counts.
    rows.append((f"full train step{tag}", t,
                 cost_counts(train_step.jitted, state, key, pose, shape,
                             train_step.assets_dev)))

    print("\nv5e roofline (XLA cost model; peaks: "
          f"{V5E_PEAK_FLOPS / 1e12:.0f} TF/s bf16 MXU, "
          f"{V5E_HBM_BPS / 1e9:.0f} GB/s HBM, ridge {RIDGE:.0f} FLOP/B; "
          "Pallas kernel interiors are opaque to the cost model — their "
          "flops/bytes are under-counted, see docs/ROOFLINE.md):")
    for name, t, counts in rows:
        roofline_row(name, t, counts)

    # Perf-regression gate (BENCH_BANDS.json): only the recorded config
    # (B=140, default bf16 encoder) is banded.
    if batch == 140 and compute_dtype is None:
        from straps_tpu.utils.bands import check_band
        timed = dict((name, t) for name, t, _ in rows)
        ok = check_band("raster_ms_b140", timed["pallas render"] * 1e3)
        ok &= check_band("train_step_ms_b140_bf16",
                         timed["full train step"] * 1e3)
        if not ok:
            sys.exit(1)


if __name__ == "__main__":
    main()
