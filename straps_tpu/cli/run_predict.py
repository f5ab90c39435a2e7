"""Prediction CLI — surface parity with the reference `run_predict.py:22-42`:

    python -m straps_tpu.cli.run_predict --input ./demo_proxies \
        --checkpoint ckpt_dir_or_reference.tar --silh-from cached
"""

import argparse

from straps_tpu.config import PredictConfig, apply_cli_overrides
from straps_tpu.predict import predict_3d
from straps_tpu.utils.profiling import enable_persistent_compile_cache


def build_parser():
    parser = argparse.ArgumentParser(description="Predict 3D human shape/pose")
    parser.add_argument("--input", required=True,
                        help="input dir (cached proxies: *_silhouette.npy + "
                             "*_joints2D.npy)")
    parser.add_argument("--checkpoint", default=None,
                        help="orbax checkpoint dir or reference .tar")
    parser.add_argument("--silh-from", default="cached",
                        choices=["cached", "pointrend", "densepose"])
    parser.add_argument("--out-dir", default="predict_out")
    parser.add_argument("--resnet-layers", type=int, default=18)
    parser.add_argument("--smpl-dir", default=None)
    parser.add_argument("--keypoint-checkpoint", default=None,
                        help="detectron2 pkl for Keypoint-RCNN")
    parser.add_argument("--silhouette-checkpoint", default=None,
                        help="detectron2 pkl for PointRend/DensePose")
    parser.add_argument("--allow-random-detectors", action="store_true",
                        help="run detector front-end with RANDOM weights "
                             "(garbage proxies — smoke/throughput runs only)")
    parser.add_argument("--heatmap-mode", default="auto",
                        choices=["auto", "clean", "legacy"],
                        help="proxy heatmap distribution; 'auto' (default) "
                             "resolves from the checkpoint (reference .tar "
                             "-> 'legacy' grid, repo checkpoints -> their "
                             "recorded training mode); explicit values "
                             "override with a mismatch warning")
    parser.add_argument("--no-vis", action="store_true",
                        help="skip all visualisation outputs (npy "
                             "predictions + cached proxies only — the "
                             "reference's save_proxy_vis/render_vis=False, "
                             "`run_predict.py:19-20`)")
    parser.add_argument("overrides", nargs="*",
                        help="key=value PredictConfig overrides (dotted "
                             "paths), e.g. detector_post_nms_topk=1000 "
                             "detector_max_detections=100 — reaches every "
                             "config field, including the detection-budget "
                             "knobs that have no dedicated flag")
    return parser


def build_config(args) -> PredictConfig:
    cfg = PredictConfig(input_dir=args.input, checkpoint=args.checkpoint,
                        silhouettes_from=args.silh_from, out_dir=args.out_dir,
                        smpl_dir=args.smpl_dir,
                        keypoint_checkpoint=args.keypoint_checkpoint,
                        silhouette_checkpoint=args.silhouette_checkpoint,
                        allow_random_detectors=args.allow_random_detectors,
                        heatmap_mode=args.heatmap_mode)
    cfg.model.resnet_layers = args.resnet_layers
    return apply_cli_overrides(cfg, args.overrides)


def main(argv=None):
    enable_persistent_compile_cache()
    args = build_parser().parse_args(argv)
    cfg = build_config(args)
    out = predict_3d(cfg, save_vis=not args.no_vis)
    print(f"predicted {len(out['names'])} images -> {args.out_dir}")
    for i, name in enumerate(out["names"]):
        print(f"  {name}: cam_wp={out['cam_wp'][i].round(3).tolist()} "
              f"betas[:3]={out['shape'][i][:3].round(3).tolist()}")


if __name__ == "__main__":
    main()
