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
