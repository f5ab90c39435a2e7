"""End-to-end rehearsal of the one-command real-assets acceptance gate
(`straps_tpu.cli.run_parity_gate`) on synthetic stand-ins written in the
REAL on-disk formats — so the day the licensed reference assets appear
(`run_predict.py:15-19`), proving parity is one already-tested command.
"""

import os
import pickle
import shutil
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from test_real_asset_formats import write_reference_additional_dir  # noqa: E402

from straps_tpu.cli.run_parity_gate import main as gate_main  # noqa: E402
from straps_tpu.smpl.fixtures import generate_synthetic_smpl_arrays  # noqa: E402


@pytest.fixture()
def asset_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("STRAPS_TPU_COMPILE_CACHE", "/tmp/jax_cache")
    arrs = generate_synthetic_smpl_arrays(seed=0)
    smpl_dir = write_reference_additional_dir(tmp_path / "additional", arrs)
    return smpl_dir, arrs


def _write_reference_tar(path, arrs):
    """torch.save a reference-format checkpoint tar
    (`train_synthetic_otf_rendering.py:365-380` layout) holding a freshly
    initialised regressor in the torch state-dict naming."""
    torch = pytest.importorskip("torch")
    from straps_tpu.models import build_regressor, flax_to_torch_state_dict

    model = build_regressor(np.asarray(arrs["mean_pose_6d"], np.float32),
                            np.asarray(arrs["mean_shape"], np.float32))
    variables = model.init(jax.random.PRNGKey(5),
                           jnp.zeros((1, 64, 64, 18)), train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flax_to_torch_state_dict(variables).items()}
    torch.save({"epoch": 3, "best_epoch": 2,
                "model_state_dict": sd, "best_model_state_dict": sd,
                "optimiser_state_dict": {}, "criterion_state_dict": {},
                "best_epoch_val_metrics": {"pves_pa": 0.06}}, str(path))


def _write_cached_proxies(d, n=2):
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        sil = np.zeros((512, 512), np.float32)
        sil[100:400, 150:350] = 1.0
        np.save(os.path.join(d, f"{i:04d}_silhouette.npy"), sil)
        joints = rng.uniform(160, 340, (17, 3)).astype(np.float32)
        np.save(os.path.join(d, f"{i:04d}_joints2D.npy"), joints)


class TestParityGateAssets:
    def test_assets_and_oracle_pass(self, asset_dir, capsys):
        smpl_dir, _ = asset_dir
        rc = gate_main(["--smpl-dir", smpl_dir])
        out = capsys.readouterr().out
        assert rc == 0, out
        assert "smpl_assets_load           PASS" in out.replace("  ", "  ") \
            or "smpl_assets_load" in out
        assert "PARITY GATE: PASS" in out
        assert "FAIL" not in out

    def test_missing_assets_fail(self, tmp_path, capsys, monkeypatch):
        monkeypatch.setenv("STRAPS_TPU_COMPILE_CACHE", "/tmp/jax_cache")
        rc = gate_main(["--smpl-dir", str(tmp_path / "nowhere")])
        out = capsys.readouterr().out
        assert rc == 1
        assert "PARITY GATE: FAIL" in out


class TestParityGateFull:
    def test_tar_predict_and_expected_roundtrip(self, asset_dir, tmp_path,
                                                capsys):
        """convert .tar -> demo predict -> diff vs expected: PASS end to
        end, then FAIL when the expected verts are perturbed by 5 mm."""
        smpl_dir, arrs = asset_dir
        tar = tmp_path / "straps_model_checkpoint.tar"
        _write_reference_tar(tar, arrs)
        proxies = str(tmp_path / "proxies")
        _write_cached_proxies(proxies)
        out_dir = str(tmp_path / "gate_out")

        args = ["--smpl-dir", smpl_dir, "--checkpoint", str(tar),
                "--input", proxies, "--out-dir", out_dir]
        rc = gate_main(args)
        text = capsys.readouterr().out
        assert rc == 0, text
        assert "regressor_checkpoint" in text
        assert "heatmap_mode=legacy" in text          # .tar resolves legacy
        assert "regressor_roundtrip" in text
        assert "demo_predict" in text
        assert "PARITY GATE: PASS" in text

        # Second run against the first run's outputs as "reference expected"
        # exercises the named-tolerance diff (deterministic pipeline ->
        # bit-identical -> 0mm PVE).
        expected = str(tmp_path / "expected")
        shutil.copytree(out_dir, expected)
        rc = gate_main(args + ["--expected", expected])
        text = capsys.readouterr().out
        assert rc == 0, text
        assert "expected_verts" in text
        assert "PARITY GATE: PASS" in text

        # A 5 mm perturbation must breach the <=1mm PVE tolerance.
        for f in sorted(os.listdir(expected)):
            if f.endswith("_verts.npy"):
                p = os.path.join(expected, f)
                np.save(p, np.load(p) + np.float32(0.005))
        rc = gate_main(args + ["--expected", expected])
        text = capsys.readouterr().out
        assert rc == 1
        assert "expected_verts" in text
        assert "PARITY GATE: FAIL" in text


class TestParityGateDetectors:
    def test_d2_pkl_conversion_gates(self, asset_dir, tmp_path, capsys):
        """All three detectron2 zoo pkl stand-ins (generated by the torch
        twins in their real {'model': ...} pickle format) must pass the
        structure gate; a truncated pkl must fail it."""
        pytest.importorskip("torch")
        from torch_twin_d2 import (
            D2DensePoseRCNNTwin, D2KeypointRCNNTwin, D2PointRendRCNNTwin,
            twin_state_to_d2,
        )
        smpl_dir, _ = asset_dir

        paths = {}
        for flag, twin, fname in [
                ("--keypoint-checkpoint", D2KeypointRCNNTwin(),
                 "keypoint_rcnn_R_50_FPN.pkl"),
                ("--silhouette-checkpoint", D2PointRendRCNNTwin(),
                 "pointrend_rcnn_R_50_fpn.pkl"),
                ("--densepose-checkpoint", D2DensePoseRCNNTwin(),
                 "densepose_rcnn_R_101_fpn_s1x.pkl")]:
            state = twin_state_to_d2(twin)
            p = tmp_path / fname
            with open(p, "wb") as f:
                pickle.dump({"model": state,
                             "__author__": "Detectron2 Model Zoo"}, f,
                            protocol=2)
            paths[flag] = str(p)

        args = ["--smpl-dir", smpl_dir]
        for flag, p in paths.items():
            args += [flag, p]
        rc = gate_main(args)
        text = capsys.readouterr().out
        assert rc == 0, text
        for row in ("keypoint_rcnn_convert", "pointrend_convert",
                    "densepose_convert"):
            assert row in text
        assert "PARITY GATE: PASS" in text

        # Drop a backbone tensor -> structure mismatch -> FAIL.
        with open(paths["--keypoint-checkpoint"], "rb") as f:
            ckpt = pickle.load(f, encoding="latin1")
        dropped = dict(ckpt["model"])
        for k in list(dropped):
            if "backbone" in k and k.endswith("weight"):
                del dropped[k]
                break
        bad = tmp_path / "bad.pkl"
        with open(bad, "wb") as f:
            pickle.dump({"model": dropped}, f, protocol=2)
        rc = gate_main(["--smpl-dir", smpl_dir,
                        "--keypoint-checkpoint", str(bad)])
        text = capsys.readouterr().out
        assert rc == 1
        assert "PARITY GATE: FAIL" in text
