import numpy as np

from straps_tpu.config import TrainConfig, PredictConfig, load_config


class TestConfig:
    def test_defaults_match_reference_literals(self):
        cfg = TrainConfig()
        assert cfg.batch_size == 140          # run_train.py:44
        assert cfg.lr == 1e-4
        assert cfg.num_epochs == 100
        assert cfg.mean_cam_t == (0.0, 0.2, 42.0)
        assert cfg.init_loss_weights["verts"] == 1.0
        assert cfg.proxy_augment.occlude_box_dim == 48
        assert cfg.smpl_augment.delta_betas_std == 1.5
        assert cfg.save_val_metrics == ("pves_pa", "mpjpes_pa")

    def test_cli_overrides(self):
        cfg = load_config(TrainConfig, None,
                          ["batch_size=16", "lr=0.001",
                           "model.resnet_layers=50",
                           "smpl_augment.delta_betas_distribution=uniform",
                           "render.backend=xla"])
        assert cfg.batch_size == 16
        assert cfg.lr == 0.001
        assert cfg.model.resnet_layers == 50
        assert cfg.smpl_augment.delta_betas_distribution == "uniform"
        assert cfg.render.backend == "xla"

    def test_yaml_overrides(self, tmp_path):
        y = tmp_path / "cfg.yaml"
        y.write_text("batch_size: 8\nmodel:\n  ief_iters: 5\n"
                     "mean_cam_t: [0.0, 0.1, 30.0]\n")
        cfg = load_config(TrainConfig, str(y), ["num_epochs=2"])
        assert cfg.batch_size == 8
        assert cfg.model.ief_iters == 5
        assert cfg.mean_cam_t == (0.0, 0.1, 30.0)
        assert cfg.num_epochs == 2

    def test_string_values_pass_through(self):
        cfg = load_config(PredictConfig, None,
                          ["silhouettes_from=pointrend", "input_dir=/tmp/x"])
        assert cfg.silhouettes_from == "pointrend"
        assert cfg.input_dir == "/tmp/x"

    def test_detector_budget_overrides_reach_the_models(self):
        """detector_post_nms_topk/max_detections/score_thresh restore the
        detectron2 crowded-scene budgets (PARITY.md deviations table)."""
        from straps_tpu.predict.pipeline import build_detector_models

        cfg = load_config(PredictConfig, None,
                          ["silhouettes_from=pointrend",
                           "detector_post_nms_topk=1000",
                           "detector_max_detections=100",
                           "detector_score_thresh=0.3"])
        kp, silh = build_detector_models(cfg, build_vis=False,
                                         output_size=512)
        for m in (kp, silh):
            assert m.post_nms_topk == 1000
            assert m.max_detections == 100
            assert m.score_thresh == 0.3
            assert m.output_size == 512
        # defaults stay on the TPU static budgets, densepose branch carries
        # the part-map flag only when vis is on
        cfg2 = load_config(PredictConfig, None,
                           ["silhouettes_from=densepose"])
        kp2, silh2 = build_detector_models(cfg2, build_vis=True,
                                           output_size=512)
        from straps_tpu.perception.rcnn import (
            MAX_DETECTIONS, POST_NMS_TOPK,
        )
        assert kp2.post_nms_topk == POST_NMS_TOPK
        assert kp2.max_detections == MAX_DETECTIONS
        assert kp2.score_thresh == 0.05
        assert silh2.output_part_maps is True


class TestCompileCacheHelper:
    def test_clis_wire_the_cache(self, monkeypatch):
        """Every CLI entry point must set up the persistent compile cache
        before doing anything else (a cold 800-square detector program costs
        minutes of remote compile; see utils/profiling.py)."""
        import pytest as _pytest

        from straps_tpu.cli import run_eval, run_predict, run_train

        calls = []
        for mod in (run_train, run_predict, run_eval):
            monkeypatch.setattr(mod, "enable_persistent_compile_cache",
                                lambda m=mod: calls.append(m.__name__))
            with _pytest.raises(SystemExit):
                mod.main(["--help"])
        assert len(calls) == 3


    def test_default_and_env_override(self, monkeypatch):
        import jax
        from straps_tpu.utils.profiling import enable_persistent_compile_cache

        prev = jax.config.jax_compilation_cache_dir
        try:
            monkeypatch.delenv("STRAPS_TPU_COMPILE_CACHE", raising=False)
            p = enable_persistent_compile_cache()
            assert p.endswith("straps_tpu_jax_cache")
            assert jax.config.jax_compilation_cache_dir == p

            monkeypatch.setenv("STRAPS_TPU_COMPILE_CACHE", "/tmp/altcache")
            assert enable_persistent_compile_cache() == "/tmp/altcache"
            assert jax.config.jax_compilation_cache_dir == "/tmp/altcache"

            # empty string disables the override entirely
            monkeypatch.setenv("STRAPS_TPU_COMPILE_CACHE", "")
            assert enable_persistent_compile_cache() == ""
            assert jax.config.jax_compilation_cache_dir == "/tmp/altcache"
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)


class TestCliOverrideReachability:
    """Every documented config field must be reachable from the shipped
    CLIs (PARITY.md advertises the detection-budget knobs as user-settable
    — `detector_post_nms_topk=1000 detector_max_detections=100` restore
    detectron2's crowded-scene budgets)."""

    def test_predict_cli_reaches_detector_budget_knobs(self):
        from straps_tpu.cli.run_predict import build_config, build_parser

        args = build_parser().parse_args(
            ["--input", "x", "detector_post_nms_topk=1000",
             "detector_max_detections=100", "detector_score_thresh=0.7",
             "model.resnet_layers=50"])
        cfg = build_config(args)
        assert cfg.detector_post_nms_topk == 1000
        assert cfg.detector_max_detections == 100
        assert cfg.detector_score_thresh == 0.7
        assert cfg.model.resnet_layers == 50

    def test_eval_cli_parser_accepts_overrides(self):
        from straps_tpu.cli.run_eval import build_parser

        args = build_parser().parse_args(
            ["--dataset", "d.npz", "img_wh=512"])
        assert args.overrides == ["img_wh=512"]

    def test_apply_cli_overrides_shared_helper(self):
        from straps_tpu.config import PredictConfig, apply_cli_overrides

        cfg = apply_cli_overrides(PredictConfig(),
                                  ["heatmap_mode=legacy",
                                   "detector_backbone_dtype=bfloat16"])
        assert cfg.heatmap_mode == "legacy"
        assert cfg.detector_backbone_dtype == "bfloat16"
