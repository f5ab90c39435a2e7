"""Evaluation CLI — the driver the reference never shipped
(SURVEY.md §4.4: `EvalMetricsTracker` exists, no script):

    python -m straps_tpu.cli.run_eval --dataset ssp3d.npz \
        --checkpoint ckpt --metrics pves pve-ts_sc silhouette_ious
"""

import argparse
import json

from straps_tpu.config import PredictConfig, apply_cli_overrides
from straps_tpu.eval_harness import load_eval_dataset, run_evaluation
from straps_tpu.utils.profiling import enable_persistent_compile_cache


def build_parser():
    parser = argparse.ArgumentParser(description="Evaluate on SSP-3D/3DPW-style npz")
    parser.add_argument("--dataset", required=True,
                        help="eval data: an SSP-3D release root (labels.npz "
                             "+ silhouettes/), that labels.npz itself, a "
                             "3DPW root, or any canonical eval npz")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--metrics", nargs="+",
                        default=["pves", "pves_sc", "pves_pa", "pve-ts",
                                 "pve-ts_sc", "mpjpes", "mpjpes_sc",
                                 "mpjpes_pa", "silhouette_ious"])
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--img-wh", type=int, default=256)
    parser.add_argument("--smpl-dir", default=None)
    parser.add_argument("--save-per-frame", default=None,
                        help="dir for per-frame metric npy dumps")
    parser.add_argument("--heatmap-mode", default="auto",
                        choices=["auto", "clean", "legacy"],
                        help="proxy heatmap distribution; 'auto' (default) "
                             "resolves from the checkpoint (reference .tar "
                             "-> 'legacy' grid, repo checkpoints -> their "
                             "recorded training mode); explicit values "
                             "override with a mismatch warning")
    parser.add_argument("--iou-frame", default="crop",
                        choices=["crop", "image"],
                        help="silhouette-IoU comparison frame: 'crop' (the "
                             "proxy crop the camera lives in) or 'image' "
                             "(raw image frame via the inverse crop affine "
                             "— the paper's SSP-3D mIoU protocol)")
    parser.add_argument("--data-parallel-devices", type=int, default=0,
                        help="fan the eval batch out over a data mesh of "
                             "this many chips (0 = single device); "
                             "batch-size must divide by it")
    parser.add_argument("overrides", nargs="*",
                        help="key=value PredictConfig overrides (dotted "
                             "paths), e.g. model.resnet_layers=50")
    return parser


def main(argv=None):
    enable_persistent_compile_cache()
    args = build_parser().parse_args(argv)

    mesh = None
    if args.data_parallel_devices:
        from straps_tpu.parallel import make_mesh
        mesh = make_mesh(args.data_parallel_devices)
    cfg = PredictConfig(checkpoint=args.checkpoint, img_wh=args.img_wh,
                        smpl_dir=args.smpl_dir,
                        heatmap_mode=args.heatmap_mode)
    apply_cli_overrides(cfg, args.overrides)
    dataset = load_eval_dataset(args.dataset)
    final = run_evaluation(dataset, cfg, metrics=tuple(args.metrics),
                           batch_size=args.batch_size,
                           save_per_frame=args.save_per_frame is not None,
                           save_path=args.save_per_frame,
                           mesh=mesh, iou_frame=args.iou_frame)
    print(json.dumps({k: float(v) for k, v in final.items()}, indent=2))


if __name__ == "__main__":
    main()
