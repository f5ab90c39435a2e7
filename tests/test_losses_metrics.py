import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp

from straps_tpu.losses import multi_task_loss, init_loss_log_vars
from straps_tpu.metrics import (
    compute_per_frame_metrics, TrainingTracker, EvalMetricsTracker,
)

RNG = np.random.RandomState(0)


def make_dicts(B=4):
    pred = {
        "verts": jnp.asarray(RNG.randn(B, 100, 3).astype(np.float32)),
        "joints2D": jnp.asarray(RNG.uniform(-1, 1, (B, 17, 2)).astype(np.float32)),
        "joints3D": jnp.asarray(RNG.randn(B, 14, 3).astype(np.float32)),
        "pose_params_rot_matrices": jnp.asarray(
            RNG.randn(B, 24, 3, 3).astype(np.float32)),
        "shape_params": jnp.asarray(RNG.randn(B, 10).astype(np.float32)),
    }
    target = {
        "verts": pred["verts"] + 0.1,
        "joints2D": jnp.asarray(RNG.uniform(0, 256, (B, 17, 2)).astype(np.float32)),
        "joints3D": pred["joints3D"] + 0.05,
        "pose_params_rot_matrices": pred["pose_params_rot_matrices"],
        "shape_params": pred["shape_params"] * 0.5,
        "vis": jnp.asarray(RNG.rand(B, 17) > 0.3),
    }
    return pred, target


class TestMultiTaskLoss:
    LOSSES_ON = ["verts", "shape_params", "pose_params", "joints2D", "joints3D"]

    def test_init_log_vars(self):
        lv = init_loss_log_vars(self.LOSSES_ON,
                                {"verts": 1.0, "joints2D": 0.1,
                                 "pose_params": 0.1, "shape_params": 0.1,
                                 "joints3D": 1.0})
        assert abs(float(lv["verts"])) < 1e-4
        assert abs(float(lv["joints2D"]) - (-np.log(0.1 + 1e-6))) < 1e-4

    def test_total_matches_manual(self):
        pred, target = make_dicts()
        lv = init_loss_log_vars(["verts"], None)
        total, d = multi_task_loss(lv, target, pred, 256)
        mse = float(jnp.mean((pred["verts"] - target["verts"]) ** 2))
        assert abs(float(total) - mse) < 1e-5  # exp(0)=1, lv=0
        assert abs(float(d["verts"]) - mse) < 1e-5

    def test_log_var_weighting(self):
        pred, target = make_dicts()
        lv = {"verts": jnp.asarray(1.0)}
        total, d = multi_task_loss(lv, target, pred, 256)
        mse = float(jnp.mean((pred["verts"] - target["verts"]) ** 2))
        assert abs(float(total) - (mse * np.exp(-1.0) + 1.0)) < 1e-5

    def test_visibility_masking(self):
        pred, target = make_dicts()
        lv = init_loss_log_vars(["joints2D"], None)
        total_vis, _ = multi_task_loss(lv, target, pred, 256)
        t2 = dict(target)
        del t2["vis"]
        total_all, _ = multi_task_loss(lv, t2, pred, 256)
        # Different masking -> different loss (unless degenerate).
        assert abs(float(total_vis) - float(total_all)) > 1e-8

    def test_grad_flows_to_log_vars(self):
        pred, target = make_dicts()
        lv = init_loss_log_vars(self.LOSSES_ON, None)

        def f(lv):
            return multi_task_loss(lv, target, pred, 256)[0]

        g = jax.grad(f)(lv)
        for k in self.LOSSES_ON:
            assert np.isfinite(float(g[k]))
            assert abs(float(g[k])) > 0


class TestMetrics:
    def test_perfect_prediction_zero_error(self):
        pred, _ = make_dicts()
        target = {k: v for k, v in pred.items()}
        m = compute_per_frame_metrics(
            ("pves", "pves_sc", "pves_pa", "mpjpes", "mpjpes_pa",
             "pose_mses", "shape_mses"), pred, target, 256)
        for k, v in m.items():
            assert np.asarray(v).max() < 1e-4, k

    def test_pa_removes_similarity(self):
        pred, _ = make_dicts()
        from scipy.spatial.transform import Rotation as SR
        R = SR.from_euler("y", 30, degrees=True).as_matrix().astype(np.float32)
        target_verts = 1.3 * np.einsum("ij,bnj->bni", R,
                                       np.asarray(pred["verts"])) + 0.5
        target = dict(pred)
        target["verts"] = jnp.asarray(target_verts)
        m = compute_per_frame_metrics(("pves", "pves_pa"), pred, target, 256)
        assert np.asarray(m["pves"]).mean() > 0.1
        assert np.asarray(m["pves_pa"]).max() < 1e-3

    def test_silhouette_iou(self):
        p = np.zeros((2, 8, 8)); p[:, :4] = 1
        t = np.zeros((2, 8, 8)); t[:, 2:6] = 1
        m = compute_per_frame_metrics(("silhouette_ious",),
                                      {"silhouettes": jnp.asarray(p)},
                                      {"silhouettes": jnp.asarray(t)}, 8)
        np.testing.assert_allclose(np.asarray(m["silhouette_ious"]),
                                   [16 / 48, 16 / 48])

    def test_reposed_metrics(self):
        pr = jnp.asarray(RNG.randn(2, 50, 3).astype(np.float32))
        m = compute_per_frame_metrics(("pve-ts", "pve-ts_sc"), {}, {}, 256,
                                      pred_reposed=pr, target_reposed=pr + 0.02)
        assert abs(np.asarray(m["pve-ts"]).mean() - np.sqrt(3 * 0.02 ** 2)) < 1e-4


class TestTrainingTracker:
    def _run_epoch(self, tracker, val_pves_pa=1.0):
        pf = {"pves_pa": np.full(4, val_pves_pa), "mpjpes_pa": np.full(4, 0.5)}
        for split in ("train", "val"):
            tracker.update_per_batch(split, 2.0, {"verts": 1.0}, pf, 4)
        tracker.update_per_epoch()

    def test_history_and_gating(self, tmp_path):
        log = str(tmp_path / "log.pkl")
        tr = TrainingTracker(["verts"], ["pves_pa", "mpjpes_pa"], log)
        tr.initialise_loss_metric_sums()
        self._run_epoch(tr, val_pves_pa=1.0)
        assert tr.history["val_pves_pa"][-1] == 1.0
        best = {"pves_pa": np.inf, "mpjpes_pa": np.inf}
        assert tr.determine_save_model_weights_this_epoch(
            ["pves_pa", "mpjpes_pa"], best)
        best = {"pves_pa": 0.5, "mpjpes_pa": np.inf}
        assert not tr.determine_save_model_weights_this_epoch(
            ["pves_pa", "mpjpes_pa"], best)
        # log pickled
        with open(log, "rb") as f:
            hist = pickle.load(f)
        assert hist["val_pves_pa"] == [1.0]

    def test_resume_truncation(self, tmp_path):
        log = str(tmp_path / "log.pkl")
        tr = TrainingTracker(["verts"], ["pves_pa"], log)
        for _ in range(3):
            tr.initialise_loss_metric_sums()
            self._run_epoch(tr)
        tr2 = TrainingTracker(["verts"], ["pves_pa"], log, load_logs=True,
                              current_epoch=2)
        assert len(tr2.history["val_pves_pa"]) == 2
        assert len(tr2.history["train_losses"]) == 2


class TestEvalTracker:
    def test_final_metrics_and_dumps(self, tmp_path):
        t = EvalMetricsTracker(["pves", "silhouette_ious"], img_wh=64,
                               save_path=str(tmp_path), save_per_frame_metrics=True)
        pf = {"pves": np.array([1.0, 2.0]),
              "silhouette_ious": np.array([0.5, 0.5]),
              "silhouette_tp": 16.0, "silhouette_fp": 8.0,
              "silhouette_fn": 8.0, "silhouette_tn": 96.0}
        t.update_per_batch(pf, 2)
        t.update_per_batch(pf, 2)
        final = t.compute_final_metrics()
        assert final["pves"] == 1.5
        assert final["silhouette_ious"] == 32 / 64
        assert os.path.exists(tmp_path / "pves_per_frame.npy")
        assert np.load(tmp_path / "pves_per_frame.npy").shape == (4,)
