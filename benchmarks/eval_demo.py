"""Evaluate a trained checkpoint on a synthetic eval set and render demo
images (BASELINE configs[2,3]-style drivers on the synthetic fixture).

Usage: python benchmarks/eval_demo.py <checkpoint_dir> [out_dir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else None
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "docs"

    import jax.numpy as jnp
    from straps_tpu.config import PredictConfig
    from straps_tpu.eval_harness import run_evaluation, synthesise_proxy_inputs
    from straps_tpu.predict.pipeline import (
        load_regressor_variables, make_predict_fn,
    )
    from straps_tpu.predict.proxy import batch_silhouettes_joints_to_proxies
    from straps_tpu.render.vis import render_body_vis, proxy_vis
    from straps_tpu.smpl import load_assets

    rng = np.random.RandomState(123)
    n = 32
    dataset = {
        "poses": (rng.randn(n, 72) * 0.25).astype(np.float32),
        "shapes": (rng.randn(n, 10) * 0.8).astype(np.float32),
        "genders": np.asarray(["n"] * n),
    }
    cfg = PredictConfig(checkpoint=ckpt)
    metrics = run_evaluation(
        dataset, cfg,
        metrics=("pves", "pves_sc", "pves_pa", "pve-ts", "pve-ts_sc",
                 "mpjpes", "mpjpes_sc", "mpjpes_pa", "silhouette_ious"),
        batch_size=8)
    print("eval metrics (synthetic fixture, metres / IoU):")
    for k, v in metrics.items():
        print(f"  {k:16s} {v:.4f}")

    # Render a couple of predictions for the docs.
    assets = load_assets(cfg.smpl_dir)
    sils, j2d = synthesise_proxy_inputs(dataset["poses"][:2],
                                        dataset["shapes"][:2], assets,
                                        cfg.img_wh)
    proxies, _ = batch_silhouettes_joints_to_proxies(
        jnp.asarray(sils), jnp.asarray(j2d), cfg.img_wh)
    model, variables, _ = load_regressor_variables(cfg, assets)
    pred = make_predict_fn(model, variables, assets, cfg.img_wh)(proxies)
    os.makedirs(out_dir, exist_ok=True)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    for i in range(2):
        rend = render_body_vis(np.asarray(pred["verts"][i]),
                               np.asarray(pred["cam_wp"][i]), assets,
                               img_wh=256)
        plt.imsave(os.path.join(out_dir, f"demo_pred_{i}.png"), rend)
        proxy_vis(np.asarray(proxies[i]),
                  os.path.join(out_dir, f"demo_proxy_{i}.png"))
    print(f"wrote demo renders to {out_dir}/")


if __name__ == "__main__":
    main()
