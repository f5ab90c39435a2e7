"""One-shot real-TPU drive of the DensePose-RCNN path incl. the
reference-exact label paste (`densepose.py::paste_densepose_labels`,
wired at `rcnn.py::DensePoseRCNN`) and the detector budget knobs
(`detector_post_nms_topk` / `detector_max_detections` /
`detector_score_thresh`, PARITY.md deviations table).

Two checks:
1. Full DensePoseRCNN forward (reduced 256^2 input so the cold compile
   stays in tens of seconds on the tunneled v5e) — exercises FPN + RPN +
   NMS + ROIAlign + DensePose heads + paste with the config-overridden
   budgets; asserts shapes/finiteness and reports steady-state latency.
2. Isolated `paste_densepose_labels` TPU-vs-CPU label agreement on
   identical logits/boxes (the einsum runs at Precision.HIGHEST, so
   labels must agree except float ties at part boundaries).

Usage: python benchmarks/drive_densepose_tpu.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from straps_tpu.utils.profiling import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    from straps_tpu.config import PredictConfig, load_config
    from straps_tpu.perception.densepose import paste_densepose_labels
    from straps_tpu.predict.pipeline import build_detector_models

    dev = jax.devices()[0]
    print(f"backend: {dev.platform} ({dev})")

    cfg = load_config(PredictConfig, None, [
        "silhouettes_from=densepose",
        "detector_post_nms_topk=256",
        "detector_max_detections=16",
        "detector_score_thresh=0.0",
    ])
    _, dp_model = build_detector_models(cfg, build_vis=True, output_size=256)
    assert dp_model.post_nms_topk == 256 and dp_model.max_detections == 16
    assert dp_model.score_thresh == 0.0 and dp_model.output_part_maps
    img = jax.random.uniform(jax.random.PRNGKey(1), (256, 256, 3)) * 255.0
    variables = dp_model.init(jax.random.PRNGKey(0), img)
    apply = jax.jit(dp_model.apply)

    t0 = time.time()
    out = apply(variables, img)
    part_map = np.asarray(out["part_map"])  # host pull = barrier
    print(f"compile+run: {time.time() - t0:.1f}s; part_map {part_map.shape} "
          f"boxes {np.asarray(out['boxes']).shape} "
          f"valid {int(np.asarray(out['valid']).sum())}")
    assert part_map.shape == (16, 256, 256)
    assert np.isfinite(np.asarray(out["boxes"])).all()
    # labels are 0..NUM_PATCHES (24): argmax over the 25 I channels.
    assert 0 <= part_map.min() and part_map.max() <= 24
    t0 = time.time()
    part_map = np.asarray(apply(variables, img)["part_map"])
    print(f"steady-state: {(time.time() - t0) * 1e3:.1f} ms")

    # Isolated paste: TPU vs CPU on identical inputs.
    rng = np.random.RandomState(7)
    s = rng.randn(12, 56, 56, 2).astype(np.float32)
    i = rng.randn(12, 56, 56, 15).astype(np.float32)
    boxes = np.stack([
        rng.uniform(0, 120, 12), rng.uniform(0, 120, 12),
        rng.uniform(130, 250, 12), rng.uniform(130, 250, 12)], -1
    ).astype(np.float32)
    fn = jax.vmap(lambda sl, il, b: paste_densepose_labels(sl, il, b,
                                                           256, 256))
    got_tpu = np.asarray(jax.jit(fn)(s, i, boxes))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        got_cpu = np.asarray(jax.jit(fn)(
            jax.device_put(s, cpu), jax.device_put(i, cpu),
            jax.device_put(boxes, cpu)))
    agree = float((got_tpu == got_cpu).mean())
    print(f"paste label agreement TPU==CPU: {agree:.6f}")
    assert agree > 0.999, "TPU/CPU pasted-label mismatch"
    print("DRIVE OK")


if __name__ == "__main__":
    main()
