"""End-to-end training tests on a tiny config + 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from straps_tpu.config import TrainConfig
from straps_tpu.data import write_synthetic_corpus
from straps_tpu.parallel import make_mesh, shard_batch, replicate, DATA_AXIS
from straps_tpu.smpl import load_synthetic_assets
from straps_tpu.train import build_training, train


def tiny_config(tmp_path, img_wh=64, batch_size=8) -> TrainConfig:
    cfg = TrainConfig()
    cfg.img_wh = img_wh
    cfg.batch_size = batch_size
    cfg.focal_length = 1250.0  # keeps the body in frame at 64x64
    cfg.render.backend = "xla"
    cfg.num_epochs = 1
    cfg.epochs_per_save = 1
    cfg.train_path = write_synthetic_corpus(str(tmp_path / "train.npz"), n=16)
    cfg.val_path = write_synthetic_corpus(str(tmp_path / "val.npz"), n=16,
                                          seed=1)
    cfg.model_save_path = str(tmp_path / "ckpt" / "model")
    cfg.log_path = str(tmp_path / "logs" / "log.pkl")
    cfg.metrics_to_track = ("pves", "pves_pa", "mpjpes_pa", "shape_mses")
    return cfg


@pytest.fixture(scope="module")
def assets():
    return load_synthetic_assets()


class TestTrainStep:
    def test_single_step_updates_params_and_decreases_nothing_nan(
            self, tmp_path, assets):
        cfg = tiny_config(tmp_path)
        model, assets_, state, tx, train_step, val_step, mesh = build_training(
            cfg, assets)
        rng = np.random.RandomState(0)
        pose = jnp.asarray(rng.randn(8, 72).astype(np.float32) * 0.2)
        shape = jnp.asarray(rng.randn(8, 10).astype(np.float32) * 0.5)
        state = replicate(state, mesh)
        batch = shard_batch({"pose": pose, "shape": shape}, mesh)
        new_state, loss, task_losses, per_frame = train_step(
            state, jax.random.PRNGKey(0), batch["pose"], batch["shape"])
        assert np.isfinite(float(loss))
        for k, v in task_losses.items():
            assert np.isfinite(float(v)), k
        for m in cfg.metrics_to_track:
            assert np.all(np.isfinite(np.asarray(per_frame[m]))), m
        # params changed
        before = jax.tree_util.tree_leaves(state.params)[0]
        after = jax.tree_util.tree_leaves(new_state.params)[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))
        # log vars changed (optimised jointly)
        assert float(new_state.log_vars["verts"]) != float(state.log_vars["verts"])
        assert int(new_state.step) == 1

    def test_batch_actually_sharded(self, tmp_path, assets):
        cfg = tiny_config(tmp_path)
        mesh = make_mesh()
        assert mesh.devices.size == 8  # conftest forces 8 CPU devices
        pose = jnp.zeros((8, 72))
        batch = shard_batch({"pose": pose}, mesh)
        shard_devs = {s.device.id for s in batch["pose"].addressable_shards}
        assert len(shard_devs) == 8

    def test_loss_decreases_over_steps(self, tmp_path, assets):
        """Overfit check: repeated steps on one fixed batch reduce the loss."""
        cfg = tiny_config(tmp_path)
        cfg.lr = 1e-3
        model, assets_, state, tx, train_step, _, mesh = build_training(
            cfg, assets)
        rng = np.random.RandomState(0)
        pose = jnp.asarray(rng.randn(8, 72).astype(np.float32) * 0.2)
        shape = jnp.asarray(rng.randn(8, 10).astype(np.float32) * 0.5)
        state = replicate(state, mesh)
        batch = shard_batch({"pose": pose, "shape": shape}, mesh)
        losses = []
        for i in range(8):
            state, loss, _, _ = train_step(state, jax.random.PRNGKey(42),
                                           batch["pose"], batch["shape"])
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses


class TestTrainLoop:
    def test_full_loop_with_checkpoint_and_resume(self, tmp_path, assets):
        cfg = tiny_config(tmp_path)
        cfg.num_epochs = 2
        cfg.epochs_per_save = 1
        state, best_params, tracker = train(cfg, assets=assets,
                                            max_steps_per_epoch=1,
                                            verbose=False)
        assert len(tracker.history["train_losses"]) == 2
        assert len(tracker.history["val_pves_pa"]) == 2
        import os
        assert os.path.isdir(f"{cfg.model_save_path}_epoch1")

        # Resume from epoch 1 and run epoch 2.
        cfg2 = tiny_config(tmp_path)
        cfg2.num_epochs = 3
        cfg2.epochs_per_save = 1
        cfg2.resume_from_epoch = 1
        state2, _, tracker2 = train(cfg2, assets=assets,
                                    max_steps_per_epoch=1, verbose=False)
        assert len(tracker2.history["train_losses"]) == 3
        assert tracker2.history["train_losses"][:2] == \
            tracker.history["train_losses"][:2]


class TestValTailAndFinalSave:
    def test_small_val_set_and_final_epoch_checkpoint(self, tmp_path, assets):
        """A val set smaller than batch_size must still produce finite val
        metrics (the tail batch is padded to the jit shape by cycling
        samples), and the FINAL epoch is checkpointed even off the
        epochs_per_save boundary (a 100-epoch reference-cadence run would
        otherwise end with its best weights only in the discarded return
        value)."""
        import os

        import numpy as np

        cfg = tiny_config(tmp_path)
        cfg.val_path = write_synthetic_corpus(str(tmp_path / "val_small.npz"),
                                              n=5, seed=9)
        cfg.num_epochs = 2
        cfg.epochs_per_save = 5    # never hits an epoch boundary
        state, best_params, tracker = train(cfg, assets=assets,
                                            max_steps_per_epoch=1,
                                            verbose=False)
        for m in cfg.save_val_metrics:
            vals = tracker.history[f"val_{m}"]
            assert len(vals) == 2 and np.isfinite(vals).all(), (m, vals)
        # 5 real samples counted, not the padded batch size
        assert os.path.isdir(f"{cfg.model_save_path}_epoch1")


class TestSilhouetteLoss:
    def test_silhouette_task_trains(self, tmp_path, assets):
        cfg = tiny_config(tmp_path)
        cfg.losses_on = ("verts", "silhouette")
        cfg.init_loss_weights = {"verts": 1.0, "silhouette": 100.0}
        cfg.silhouette_loss_wh = 32
        model, assets_, state, tx, train_step, _, mesh = build_training(
            cfg, assets)
        rng = np.random.RandomState(0)
        pose = jnp.asarray(rng.randn(8, 72).astype(np.float32) * 0.2)
        shape = jnp.asarray(rng.randn(8, 10).astype(np.float32) * 0.5)
        state = replicate(state, mesh)
        batch = shard_batch({"pose": pose, "shape": shape}, mesh)
        new_state, loss, task_losses, _ = train_step(
            state, jax.random.PRNGKey(0), batch["pose"], batch["shape"])
        assert np.isfinite(float(loss))
        assert "silhouette" in task_losses
        assert np.isfinite(float(task_losses["silhouette"]))
        assert float(new_state.log_vars["silhouette"]) != \
            float(state.log_vars["silhouette"])


class TestDataParallelCorrectness:
    def test_8dev_step_matches_1dev(self, tmp_path, assets):
        """The sharded step must compute the same gradients as the
        single-device step (SPMD all-reduce correctness).  SGD with lr=1 is
        used so the parameter delta IS the gradient — Adam's first step is
        +-lr*sign(g), which amplifies reduction-order noise on near-zero
        gradients into spurious mismatches."""
        import optax
        from straps_tpu.models import build_regressor
        from straps_tpu.losses import init_loss_log_vars
        from straps_tpu.parallel import make_mesh
        from straps_tpu.train import (
            create_train_state, make_train_step,
        )

        cfg = tiny_config(tmp_path)
        rng = np.random.RandomState(0)
        pose = jnp.asarray(rng.randn(8, 72).astype(np.float32) * 0.2)
        shape = jnp.asarray(rng.randn(8, 10).astype(np.float32) * 0.5)
        key = jax.random.PRNGKey(3)

        model = build_regressor(assets.mean_pose_6d, assets.mean_shape)
        variables = model.init(jax.random.PRNGKey(cfg.seed),
                               jnp.zeros((1, 64, 64, 18)), train=False)
        log_vars = init_loss_log_vars(cfg.losses_on, cfg.init_loss_weights)
        tx = optax.sgd(1.0)

        results = {}
        for n_dev in (1, 8):
            state = create_train_state(variables["params"],
                                       variables["batch_stats"],
                                       dict(log_vars), tx)
            mesh = make_mesh(n_dev)
            assert mesh.devices.size == n_dev
            train_step = make_train_step(model, assets, cfg, tx)
            state = replicate(state, mesh)
            batch = shard_batch({"pose": pose, "shape": shape}, mesh)
            new_state, loss, _, _ = train_step(state, key, batch["pose"],
                                               batch["shape"])
            grads = jax.tree_util.tree_map(
                lambda new, old: np.asarray(new) - np.asarray(old),
                new_state.params, state.params)
            results[n_dev] = (float(loss), grads)
        loss1, grads1 = results[1]
        loss8, grads8 = results[8]
        assert abs(loss1 - loss8) < 1e-4, (loss1, loss8)
        for a, b in zip(jax.tree_util.tree_leaves(grads1),
                        jax.tree_util.tree_leaves(grads8)):
            scale = max(np.abs(a).max(), 1e-8)
            np.testing.assert_allclose(a / scale, b / scale, atol=2e-4)
