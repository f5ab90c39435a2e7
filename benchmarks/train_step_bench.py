"""Training-step benchmark on the real TPU (BASELINE config[4]: synthetic
on-the-fly-rendered training).

Measures the fully fused jitted step (augment -> SMPL -> Pallas render ->
crop -> degrade -> heatmaps -> fwd/bwd -> Adam) at the reference batch size.

Usage: python benchmarks/train_step_bench.py [batch_size] [steps] [dtype]
  dtype: optional 'bfloat16' runs the encoder convs (fwd+bwd) in bf16 with
  f32 master weights (model.compute_dtype); SMPL stays f32/highest.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 140
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    dtype = sys.argv[3] if len(sys.argv) > 3 else None

    import jax
    import jax.numpy as jnp
    from straps_tpu.config import TrainConfig
    from straps_tpu.parallel import make_mesh, replicate, shard_batch
    from straps_tpu.smpl import load_synthetic_assets
    from straps_tpu.train import build_training

    cfg = TrainConfig()
    cfg.batch_size = batch
    if dtype:
        # bf16 is the config default (r3); 'float32' forces full-f32 compute.
        cfg.model.compute_dtype = (None if dtype in ("float32", "f32")
                                   else dtype)
    assets = load_synthetic_assets()
    model, assets, state, tx, train_step, val_step, mesh = build_training(
        cfg, assets)
    rng = np.random.RandomState(0)
    pose = jnp.asarray(rng.randn(batch, 72).astype(np.float32) * 0.2)
    shape = jnp.asarray(rng.randn(batch, 10).astype(np.float32) * 0.5)
    state = replicate(state, mesh)
    b = shard_batch({"pose": pose, "shape": shape}, mesh)

    # Host pulls (float(loss)) are the completion barrier: on the tunneled
    # backend block_until_ready can return before enqueued work executes.
    t0 = time.perf_counter()
    state, loss, task_losses, per_frame = train_step(
        state, jax.random.PRNGKey(0), b["pose"], b["shape"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
          f"loss={float(loss):.4f} "
          f"(compute_dtype={cfg.model.compute_dtype or 'float32'})")

    t0 = time.perf_counter()
    for i in range(steps):
        state, loss, task_losses, per_frame = train_step(
            state, jax.random.PRNGKey(i + 1), b["pose"], b["shape"])
    final_loss = float(loss)
    dt = (time.perf_counter() - t0) / steps
    print(f"steady train step: {dt * 1e3:.1f} ms  "
          f"({batch / dt:.0f} samples/s, batch={batch}, "
          f"final loss {final_loss:.4f})")
    print(f"epoch estimate for 91k AMASS samples: {91000 / (batch / dt):.0f}s")


if __name__ == "__main__":
    main()
