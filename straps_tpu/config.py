"""Typed configuration tree.

One dataclass hierarchy with YAML + CLI overrides replaces the reference's
four config mechanisms (module constants in `config.py`, hyperparameter
literals in `run_train.py:30-88`, argparse in `run_predict.py`, and yacs YAML
for the detectors) — see SURVEY.md §5 "Config / flag system".
Defaults reproduce the reference's released training configuration.
"""

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple


@dataclass
class SmplAugmentConfig:
    augment_shape: bool = True
    delta_betas_distribution: str = "normal"        # 'normal' | 'uniform'
    delta_betas_std: float = 1.5                    # run_train.py:135
    delta_betas_range: Tuple[float, float] = (-3.0, 3.0)


@dataclass
class CamAugmentConfig:
    xy_std: float = 0.05                            # run_train.py:143
    delta_z_range: Tuple[float, float] = (-5.0, 5.0)


@dataclass
class BboxAugmentConfig:
    crop_input: bool = True                         # run_train.py:149
    mean_scale_factor: float = 1.2
    delta_scale_range: Tuple[float, float] = (-0.2, 0.2)
    delta_centre_range: Tuple[float, float] = (-5.0, 5.0)


@dataclass
class ProxyAugmentConfig:
    remove_appendages: bool = True                  # run_train.py:156-170
    deviate_joints2D: bool = True
    deviate_verts2D: bool = True
    occlude_seg: bool = True
    remove_appendages_classes: Tuple[int, ...] = (1, 2, 3, 4, 5, 6)
    remove_appendages_probabilities: Tuple[float, ...] = (
        0.1, 0.1, 0.1, 0.1, 0.05, 0.05)
    delta_j2d_dev_range: Tuple[float, float] = (-8.0, 8.0)
    delta_j2d_hip_dev_range: Tuple[float, float] = (-8.0, 8.0)
    delta_verts2d_dev_range: Tuple[float, float] = (-0.01, 0.01)
    occlude_probability: float = 0.5
    occlude_box_dim: int = 48


@dataclass
class ModelConfig:
    resnet_in_channels: int = 18                    # run_train.py:35
    resnet_layers: int = 18
    ief_iters: int = 3
    # Encoder compute dtype; params stay float32.  bfloat16 is the default:
    # it runs the convs at MXU rate (train step 168 -> 148 ms @ B=140) and a
    # 120-epoch convergence run matches f32 (val PVE-PA 60.4 vs 58.0 mm;
    # seed-matched 40-epoch pair delta 0.007 — README "bf16 convergence").
    # Set to None for full-f32 compute.
    compute_dtype: Optional[str] = "bfloat16"


@dataclass
class RenderConfig:
    backend: str = "pallas"                         # 'pallas' | 'xla'
    interpret: bool = False                         # Pallas interpret (CPU)


@dataclass
class TrainConfig:
    batch_size: int = 140                           # run_train.py:44
    lr: float = 1e-4
    num_epochs: int = 100
    epochs_per_save: int = 10
    img_wh: int = 256
    focal_length: float = 5000.0
    mean_cam_t: Tuple[float, float, float] = (0.0, 0.2, 42.0)  # run_train.py:114
    losses_on: Tuple[str, ...] = (
        "verts", "shape_params", "pose_params", "joints2D", "joints3D")
    init_loss_weights: Dict[str, float] = field(default_factory=lambda: {
        "verts": 1.0, "joints2D": 0.1, "pose_params": 0.1,
        "shape_params": 0.1, "joints3D": 1.0})
    metrics_to_track: Tuple[str, ...] = (
        "pves", "pves_sc", "pves_pa", "pve-ts", "pve-ts_sc", "mpjpes",
        "mpjpes_sc", "mpjpes_pa", "shape_mses", "pose_mses", "joints2D_l2es")
    save_val_metrics: Tuple[str, ...] = ("pves_pa", "mpjpes_pa")
    train_path: str = "data/amass_up3d_3dpw_train.npz"
    val_path: str = "data/up3d_3dpw_val.npz"
    params_from: str = "all"
    model_save_path: str = "checkpoints/model_training/straps_model_checkpoint"
    log_path: str = "logs/straps_model_logs.pkl"
    resume_from_epoch: Optional[int] = None
    seed: int = 0
    smpl_dir: Optional[str] = None                  # None -> synthetic assets
    model: ModelConfig = field(default_factory=ModelConfig)
    render: RenderConfig = field(default_factory=RenderConfig)
    smpl_augment: SmplAugmentConfig = field(default_factory=SmplAugmentConfig)
    cam_augment: CamAugmentConfig = field(default_factory=CamAugmentConfig)
    bbox_augment: BboxAugmentConfig = field(default_factory=BboxAugmentConfig)
    proxy_augment: ProxyAugmentConfig = field(default_factory=ProxyAugmentConfig)
    # Parallelism: size of the data-parallel mesh axis (0 = all devices).
    data_parallel_devices: int = 0
    # matmul precision for the parity-critical SMPL path
    smpl_precision: Optional[str] = "highest"
    # 'clean' (centred Gaussian) | 'legacy' (reference-exact linspace grid,
    # `utils/label_conversions.py:90-127`) — use legacy with converted
    # reference checkpoints; measured delta at std=4: interior max ~0.15,
    # border up to 1.0 (legacy's paste is end-exclusive at img_wh-1).
    heatmap_mode: str = "clean"
    # resolution of the (optional) differentiable silhouette loss
    silhouette_loss_wh: int = 64


@dataclass
class PredictConfig:
    input_dir: str = "demo"
    checkpoint: Optional[str] = None
    silhouettes_from: str = "cached"   # 'cached' | 'pointrend' | 'densepose'
    proxy_dir: Optional[str] = None    # dir of precomputed proxies (cached)
    # detectron2-format detector checkpoints (converted on load):
    keypoint_checkpoint: Optional[str] = None
    silhouette_checkpoint: Optional[str] = None
    # Running the detector front-end without converted checkpoints produces
    # garbage proxies; it must be opted into explicitly (smoke/throughput
    # runs only).
    allow_random_detectors: bool = False
    # 'bfloat16' runs the detector backbones at MXU rate (heads/NMS stay
    # f32).  None (default) keeps the twin-verified f32 numerics.
    detector_backbone_dtype: Optional[str] = None
    # 'bfloat16' casts the proxy on device before the regressor encoder —
    # the serving fast path (~+15% throughput, docs/ROOFLINE.md) at ~0.4%
    # relative rounding on gaussian heatmap channels (binary channels
    # exact).  None (default) keeps f32 parity semantics.
    proxy_input_dtype: Optional[str] = None
    # Static detection budgets (PARITY.md "documented deviations"): the
    # defaults (512/8) are TPU static-shape budgets tuned for STRAPS's
    # one-centred-person use; set 1000/100 to reproduce detectron2's
    # POST_NMS_TOPK_TEST / DETECTIONS_PER_IMAGE on crowded scenes at the
    # cost of one recompile and proportionally more NMS/head work.
    detector_post_nms_topk: Optional[int] = None
    detector_max_detections: Optional[int] = None
    # detectron2 ROI_HEADS.SCORE_THRESH_TEST.
    detector_score_thresh: float = 0.05
    out_dir: str = "predict_out"
    img_wh: int = 256
    smpl_dir: Optional[str] = None
    # 'auto' (default) resolves from the checkpoint: reference `.tar`
    # checkpoints (`run_predict.py:15-16`) were trained on legacy-grid
    # heatmaps (`utils/label_conversions.py:90-127`) so they get 'legacy';
    # repo orbax checkpoints carry their training mode in metadata; no
    # checkpoint -> 'clean'.  An explicit 'clean'/'legacy' always wins but
    # warns when it contradicts what the checkpoint was trained on
    # (border-joint channels differ by up to 1.0 between modes).
    heatmap_mode: str = "auto"         # 'auto' | 'clean' | 'legacy'
    model: ModelConfig = field(default_factory=ModelConfig)


def _apply_overrides(obj: Any, overrides: Dict[str, Any]) -> Any:
    """Apply {'a.b.c': value} overrides to a (nested) dataclass."""
    for key, value in overrides.items():
        parts = key.split(".")
        node = obj
        for p in parts[:-1]:
            node = getattr(node, p)
        cur = getattr(node, parts[-1])
        if dataclasses.is_dataclass(cur) and isinstance(value, dict):
            _apply_overrides(cur, value)
        else:
            if isinstance(cur, tuple) and isinstance(value, (list, tuple)):
                value = tuple(value)
            setattr(node, parts[-1], value)
    return obj


def apply_cli_overrides(cfg, cli_overrides: Optional[Sequence[str]]):
    """Apply 'dotted.key=value' CLI override strings to a config in place
    (values parsed as Python literals, falling back to raw strings).
    Shared by every CLI so all config fields — including ones without a
    dedicated flag, e.g. the detection-budget knobs — stay reachable from
    the command line."""
    import ast

    for item in cli_overrides or []:
        key, _, raw = item.partition("=")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        _apply_overrides(cfg, {key: value})
    return cfg


def load_config(cls, yaml_path: Optional[str] = None,
                cli_overrides: Optional[Sequence[str]] = None):
    """Build a config: defaults <- YAML file <- 'key=value' CLI overrides."""
    cfg = cls()
    if yaml_path:
        import yaml
        with open(yaml_path) as f:
            data = yaml.safe_load(f) or {}
        _apply_overrides(cfg, data)
    return apply_cli_overrides(cfg, cli_overrides)
