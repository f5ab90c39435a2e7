"""Footgun-free reference-checkpoint path (VERDICT r3 Missing #1).

The released reference checkpoint (`run_predict.py:15-16`) was trained on
proxies built by the legacy torch heatmap path
(`utils/label_conversions.py:90-127`).  These tests pin the policy that makes
running it impossible to get silently wrong:

  * loading a `.tar` resolves ``heatmap_mode='auto'`` to ``'legacy'``;
  * repo orbax checkpoints record their training heatmap mode in metadata
    and ``'auto'`` resolves to it;
  * an explicit mode that contradicts the checkpoint warns;
  * end-to-end: ``predict_3d`` on a converted twin `.tar` agrees with the
    torch twin regressor fed the REFERENCE-built proxy (numpy port of the
    `label_conversions.py:90-127` paste loop) — and does NOT agree with the
    clean-mode proxies it would have built before this policy.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from test_torch_parity import build_torch_regressor  # noqa: E402
# Aliased so pytest does not re-collect the imported test class here.
from test_geometry import TestHeatmaps as _HeatmapOracle  # noqa: E402

from straps_tpu.config import PredictConfig  # noqa: E402
from straps_tpu.geometry import crop_and_resize_padded  # noqa: E402
from straps_tpu.models import (  # noqa: E402
    build_regressor, flax_to_torch_state_dict,
)
from straps_tpu.predict import (  # noqa: E402
    load_regressor_variables, predict_3d, resolve_heatmap_mode,
)
from straps_tpu.predict.pipeline import save_proxies  # noqa: E402
from straps_tpu.utils.checkpoints import (  # noqa: E402
    decode_meta_str, restore_checkpoint, save_checkpoint,
)

IMG_WH = 64


def _flax_variables(seed=0):
    mean_pose = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), 24)
    model = build_regressor(mean_pose, np.zeros(10, np.float32))
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, IMG_WH, IMG_WH, 18)), train=False)
    return model, jax.tree_util.tree_map(np.asarray, variables)


def _write_reference_tar(path, variables):
    """Reference checkpoint dict layout
    (`train_synthetic_otf_rendering.py:365-380`)."""
    sd = flax_to_torch_state_dict(variables)
    tsd = {k: torch.from_numpy(np.ascontiguousarray(v))
           for k, v in sd.items()}
    torch.save({"epoch": 3, "best_epoch": 2,
                "model_state_dict": tsd, "best_model_state_dict": tsd,
                "optimiser_state_dict": {}, "criterion_state_dict": {},
                "best_epoch_val_metrics": {"pves_pa": 0.06}}, str(path))


def _demo_inputs(n=2, full_wh=96):
    """Silhouette blobs + joints, with joints near the silhouette-bbox edge
    so that after the proxy crop several land on the crop border — where
    clean and legacy heatmaps differ by 1.0 (legacy's end-exclusive paste)."""
    rng = np.random.RandomState(11)
    sils = np.zeros((n, full_wh, full_wh), np.float32)
    joints = np.zeros((n, 17, 2), np.float32)
    for i in range(n):
        r0, c0 = rng.randint(8, 20, 2)
        h, w = rng.randint(40, 60, 2)
        sils[i, r0:r0 + h, c0:c0 + w] = 1.0
        joints[i, :, 0] = rng.uniform(c0 - 6, c0 + w + 6, 17)
        joints[i, :, 1] = rng.uniform(r0 - 6, r0 + h + 6, 17)
    return sils, joints


class TestModeResolution:
    def test_auto_no_checkpoint_is_clean(self):
        assert resolve_heatmap_mode("auto", None, "None") == "clean"

    def test_auto_tar_is_legacy(self, tmp_path):
        model, variables = _flax_variables()
        tar = tmp_path / "ref.tar"
        _write_reference_tar(tar, variables)
        cfg = PredictConfig(checkpoint=str(tar), img_wh=IMG_WH)
        cfg.model.compute_dtype = None

        from straps_tpu.smpl import load_assets
        assets = load_assets(None)
        _, _, mode = load_regressor_variables(cfg, assets)
        assert mode == "legacy"

    def test_explicit_mismatch_warns(self):
        with pytest.warns(UserWarning, match="contradicts the checkpoint"):
            assert resolve_heatmap_mode("clean", "legacy", "x.tar") == "clean"
        with pytest.warns(UserWarning, match="contradicts the checkpoint"):
            assert resolve_heatmap_mode("legacy", "clean", "ckpt") == "legacy"

    def test_explicit_match_is_silent(self, recwarn):
        assert resolve_heatmap_mode("legacy", "legacy", "x.tar") == "legacy"
        assert resolve_heatmap_mode("clean", None, "None") == "clean"
        assert not [w for w in recwarn if issubclass(w.category, UserWarning)]

    def test_invalid_mode_rejected(self):
        with pytest.raises(ValueError, match="heatmap_mode"):
            resolve_heatmap_mode("LEGACY", None, "x")


def _train_state():
    from straps_tpu.train import create_train_state, make_optimizer

    _, variables = _flax_variables()
    log_vars = {"verts": jnp.zeros(())}
    return create_train_state(variables["params"], variables["batch_stats"],
                              log_vars, make_optimizer(1e-4))


class TestOrbaxMetadata:
    def test_save_restore_records_mode(self, tmp_path):
        """Repo-trained checkpoints carry heatmap_mode so 'auto' resolves to
        the distribution the model was actually trained on (train/loop.py
        threads TrainConfig.heatmap_mode into save_checkpoint)."""
        state = _train_state()
        path = tmp_path / "ckpt"
        save_checkpoint(str(path), state, epoch=1, best_epoch=1,
                        best_params=state.params,
                        best_epoch_val_metrics={"pves_pa": 0.1},
                        heatmap_mode="legacy")
        restored = restore_checkpoint(str(path), state)
        assert decode_meta_str(restored["meta"]["heatmap_mode"]) == "legacy"

        # And 'auto' in the predict path resolves to the recorded mode.
        cfg = PredictConfig(checkpoint=str(path), img_wh=IMG_WH)
        cfg.model.compute_dtype = None
        from straps_tpu.smpl import load_assets
        _, _, mode = load_regressor_variables(cfg, load_assets(None))
        assert mode == "legacy"

    def test_old_checkpoint_without_meta_restores(self, tmp_path):
        """Checkpoints written before the meta subtree still restore (the
        template only includes 'meta' when the checkpoint has it) and the
        predict path falls back to 'clean' under 'auto'."""
        state = _train_state()
        path = tmp_path / "ckpt_old"
        save_checkpoint(str(path), state, epoch=2, best_epoch=1,
                        best_params=state.params,
                        best_epoch_val_metrics={"pves_pa": 0.2})
        restored = restore_checkpoint(str(path), state)
        assert "meta" not in restored
        assert int(restored["epoch"]) == 2

        cfg = PredictConfig(checkpoint=str(path), img_wh=IMG_WH)
        cfg.model.compute_dtype = None
        from straps_tpu.smpl import load_assets
        _, _, mode = load_regressor_variables(cfg, load_assets(None))
        assert mode == "clean"


class TestTarPredictE2E:
    def test_tar_predict_matches_twin_on_reference_proxies(self, tmp_path):
        """Converted twin `.tar` through `predict_3d` (default 'auto' mode)
        == torch twin regressor fed the reference-built legacy proxy — and
        != the twin fed clean-mode proxies (the pre-fix silent footgun)."""
        model, variables = _flax_variables(seed=5)
        tar = tmp_path / "straps_model_checkpoint.tar"
        _write_reference_tar(tar, variables)

        sils, joints = _demo_inputs()
        proxy_dir = tmp_path / "proxies"
        names = [f"img{i}" for i in range(len(sils))]
        save_proxies(str(proxy_dir), names, sils, joints)

        cfg = PredictConfig(input_dir=str(proxy_dir), checkpoint=str(tar),
                            silhouettes_from="cached",
                            out_dir=str(tmp_path / "out"), img_wh=IMG_WH)
        cfg.model.compute_dtype = None          # twin parity needs f32
        assert cfg.heatmap_mode == "auto"       # the default under test
        out = predict_3d(cfg, save_vis=False)

        # Reference-built proxy: repo crop (parity-tested elsewhere) +
        # an INDEPENDENT numpy port of the reference torch heatmap paste
        # loop (`utils/label_conversions.py:90-127`).
        def build_proxy(hm_fn):
            proxies = []
            for s, j in zip(sils, joints):
                sil_c, j_c = crop_and_resize_padded(
                    jnp.asarray(s), jnp.asarray(j), IMG_WH)
                sil_c = (np.asarray(sil_c) > 0).astype(np.float32)
                hm = hm_fn(np.asarray(j_c)[None])[0]     # (17, H, W)
                proxies.append(np.concatenate(
                    [sil_c[None], hm], axis=0))          # (18, H, W) NCHW
            return np.stack(proxies)

        ref_hm = _HeatmapOracle._reference_torch_heatmaps
        legacy_nchw = build_proxy(lambda j: ref_hm(j, IMG_WH))

        # Heatmaps must actually discriminate the modes in this fixture:
        # border joints differ by 1.0 between clean and legacy.
        from straps_tpu.geometry import joints_to_gaussian_heatmaps
        clean_nchw = build_proxy(lambda j: np.asarray(
            joints_to_gaussian_heatmaps(jnp.asarray(j), IMG_WH,
                                        mode="clean")))
        assert np.abs(legacy_nchw - clean_nchw).max() > 0.5

        tmodel = build_torch_regressor()
        tsd = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in flax_to_torch_state_dict(variables).items()}
        tmodel.load_state_dict(tsd, strict=False)
        tmodel.eval()
        with torch.no_grad():
            cam_t, _, shape_t = tmodel(torch.from_numpy(legacy_nchw))
            cam_c, _, shape_c = tmodel(torch.from_numpy(clean_nchw))

        np.testing.assert_allclose(out["cam_wp"], cam_t.numpy(),
                                   atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(out["shape"], shape_t.numpy(),
                                   atol=5e-4, rtol=1e-3)
        # The clean-mode proxies (the old default) give measurably different
        # predictions; if they didn't, this test couldn't catch a regression
        # back to mode='clean'.
        delta = np.abs(np.concatenate([cam_t.numpy(), shape_t.numpy()], 1) -
                       np.concatenate([cam_c.numpy(), shape_c.numpy()], 1))
        assert delta.max() > 5e-3, delta.max()
