"""Stage-level timing of the training step on the real TPU: synthetic data
generation (augment+SMPL+render+crop+heatmaps), forward+loss, full step.

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

    # Stage 1: SMPL forward alone.
    smpl_fn = jax.jit(lambda s: smpl_forward(assets, s))
    t = timeit(smpl_fn, shape)
    print(f"smpl_forward (reposed): {t * 1e3:7.1f} ms")

    # Stage 2: render alone.
    K = jnp.asarray(get_intrinsics_matrix(256, 256, 5000.0))
    verts = smpl_fn(shape).vertices
    cam_t = jnp.tile(jnp.asarray([[0.0, 0.2, 42.0]]), (batch, 1))
    rend_fn = jax.jit(lambda v, t_: render_part_seg(
        v, t_, K, assets.faces, assets.face_parts, 256, backend="pallas"))
    t = timeit(rend_fn, verts, cam_t)
    print(f"pallas render:          {t * 1e3:7.1f} ms")

    # Stage 3: full synthetic batch generation.
    synth_fn = jax.jit(lambda k, p, s: generate_synthetic_batch(
        k, p, s, assets, cfg, augment=True))
    t = timeit(synth_fn, key, pose, shape)
    print(f"synthetic batch gen:    {t * 1e3:7.1f} ms")

    # Stage 4: full train step.
    if compute_dtype:
        cfg.model.compute_dtype = compute_dtype
    model, assets2, state, tx, train_step, val_step, mesh = build_training(
        cfg, assets)
    t = timeit(lambda: train_step(state, key, pose, shape)[1], n=10)
    tag = f" ({compute_dtype})" if compute_dtype else ""
    print(f"full train step{tag}:        {t * 1e3:7.1f} ms")


if __name__ == "__main__":
    main()
