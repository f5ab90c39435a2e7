"""Real-asset ON-DISK-FORMAT rehearsal tests (VERDICT r2 next-round #1).

Every parser that gates the real-assets-appear day is exercised against a
file written in the ACTUAL on-disk format the reference consumes:

  * chumpy-stripped SMPL pickle with a scipy-sparse ``J_regressor`` and a
    uint32 ``kintree_table`` -> ``load_smpl_pkl`` + the full
    ``load_assets`` directory layout (`models/smpl_official.py:15-25`,
    reference `config.py:3-10`);
  * the colour-cube part assets ``vertex_texture.npy`` (1,F,ts,ts,ts,3) /
    ``cube_parts.npy`` -> ``derive_face_parts_from_cube``
    (`renderers/nmr_renderer.py:37-50,93-101`);
  * a detectron2 ``{'model': {...}}`` pickle -> ``load_d2_pkl``
    (`predict/predict_3D.py:51,60`);
  * a ``torch.save`` ``.tar`` with ``best_model_state_dict`` ->
    ``load_reference_checkpoint`` (`run_predict.py:15-16`);
  * a ``scipy.io.savemat`` UV-symmetry ``.mat`` ->
    ``DensePoseTransformData.load`` (`DensePose/densepose/structures.py:10-37`).

All fixture files are generated in tmp_path in the byte formats the real
assets use (pickle protocol 2 — the reference assets are python-2 era and
loaded with encoding='latin1'; float64 payloads; sparse matrices).
"""

import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from straps_tpu import constants as C
from straps_tpu.smpl import load_assets, load_synthetic_assets, smpl_forward
from straps_tpu.smpl.assets import (
    derive_face_parts_from_cube, load_smpl_pkl,
)
from straps_tpu.smpl.fixtures import generate_synthetic_smpl_arrays


def _write_real_format_smpl_pkl(path, arrs, extra_betas=2):
    """Write a chumpy-stripped SMPL pkl exactly as the reference assets ship
    it: float64 arrays, scipy-sparse J_regressor, uint32 kintree_table with
    the root parent stored as 0xFFFFFFFF, plus the bookkeeping keys real
    files carry ('J', 'bs_style', 'bs_type')."""
    import scipy.sparse

    V = arrs["v_template"].shape[0]
    # Real SMPL 1.1 pkls carry more than 10 shape dirs; the loader must
    # truncate to NUM_BETAS.
    shapedirs = np.concatenate(
        [arrs["shapedirs"],
         np.zeros((V, 3, extra_betas), np.float64)], axis=2)
    # Loader re-derives the smplx layout ((V*3, 207) -> T) from the on-disk
    # (V, 3, 207) layout.
    posedirs_disk = arrs["posedirs"].T.reshape(V, 3, 207)
    kintree = np.zeros((2, 24), np.uint32)
    kintree[0] = np.asarray(arrs["parents"], np.int64).astype(np.uint32)
    kintree[0, 0] = np.uint32(0xFFFFFFFF)      # root parent, as shipped
    kintree[1] = np.arange(24, dtype=np.uint32)
    data = {
        "v_template": arrs["v_template"].astype(np.float64),
        "shapedirs": shapedirs.astype(np.float64),
        "posedirs": posedirs_disk.astype(np.float64),
        "J_regressor": scipy.sparse.csc_matrix(
            arrs["J_regressor"].astype(np.float64)),
        "weights": arrs["lbs_weights"].astype(np.float64),
        "f": arrs["faces"].astype(np.uint32),
        "kintree_table": kintree,
        # Present in real files; must be ignored by the loader:
        "J": arrs["J_regressor"].astype(np.float64) @
             arrs["v_template"].astype(np.float64),
        "bs_style": b"lbs",
        "bs_type": b"lrotmin",
    }
    with open(path, "wb") as f:
        pickle.dump(data, f, protocol=2)       # py2-era files


def write_reference_additional_dir(root, arrs):
    """Write the reference's full `additional/` asset directory layout
    (reference `config.py:3-10`) from a synthetic-fixture array dict, every
    file in its real on-disk format. Returns the smpl subdirectory path.
    Shared with tests/test_parity_gate.py."""
    import os

    smpl_dir = os.path.join(str(root), "smpl")
    os.makedirs(smpl_dir, exist_ok=True)
    _write_real_format_smpl_pkl(
        os.path.join(smpl_dir, "SMPL_NEUTRAL.pkl"), arrs)
    np.save(os.path.join(str(root), "J_regressor_extra.npy"),
            arrs["J_regressor_extra"].astype(np.float64))
    np.save(os.path.join(str(root), "cocoplus_regressor.npy"),
            arrs["J_regressor_cocoplus"].astype(np.float64))
    np.save(os.path.join(str(root), "J_regressor_h36m.npy"),
            arrs["J_regressor_h36m"].astype(np.float64))
    np.savez(os.path.join(str(root), "neutral_smpl_mean_params_6dpose.npz"),
             pose=np.asarray(arrs["mean_pose_6d"], np.float32),
             shape=np.asarray(arrs["mean_shape"], np.float32))
    # Colour-cube part assets encoding the fixture's own face_parts:
    F = arrs["faces"].shape[0]
    ts = 2
    colours = (np.asarray(arrs["face_parts"], np.float64)[:, None]
               * 10.0 + 0.5) / 100.0       # floor(100c) = 10*part
    tex = np.zeros((1, F, ts, ts, ts, 3), np.float32)
    tex[0, :, :, :, :, :] = colours[:, None, None, None, :]
    np.save(os.path.join(str(root), "vertex_texture.npy"), tex)
    cube = np.zeros((101, 101, 101), np.float64)
    for p in range(8):
        cube[10 * p, 10 * p, 10 * p] = p
    np.save(os.path.join(str(root), "cube_parts.npy"), cube)
    return smpl_dir


class TestSmplPklFormat:
    def test_load_smpl_pkl_round_trip(self, tmp_path):
        arrs = generate_synthetic_smpl_arrays(seed=3)
        path = tmp_path / "SMPL_NEUTRAL.pkl"
        _write_real_format_smpl_pkl(path, arrs)

        d = load_smpl_pkl(str(path))
        np.testing.assert_allclose(d["v_template"], arrs["v_template"],
                                   atol=1e-6)
        assert d["shapedirs"].shape[-1] == C.NUM_BETAS  # 12 -> 10 truncation
        np.testing.assert_allclose(d["shapedirs"], arrs["shapedirs"],
                                   atol=1e-6)
        # posedirs back in the smplx (207, V*3) layout:
        np.testing.assert_allclose(d["posedirs"], arrs["posedirs"], atol=1e-6)
        # sparse J_regressor densified:
        np.testing.assert_allclose(d["J_regressor"], arrs["J_regressor"],
                                   atol=1e-6)
        np.testing.assert_array_equal(d["faces"], arrs["faces"])
        assert d["faces"].dtype == np.int32
        # uint32 0xFFFFFFFF root -> -1:
        assert d["parents"][0] == -1
        np.testing.assert_array_equal(d["parents"][1:],
                                      np.asarray(arrs["parents"])[1:])

    def test_full_reference_directory_layout(self, tmp_path):
        """additional/{smpl/SMPL_NEUTRAL.pkl, *.npy, mean params npz} ->
        load_assets -> smpl_forward, matching the synthetic-asset forward
        (same underlying arrays, different serialisation)."""
        arrs = generate_synthetic_smpl_arrays(seed=0)
        smpl_dir = write_reference_additional_dir(tmp_path / "additional",
                                                  arrs)

        assets = load_assets(str(smpl_dir))
        assert not assets.is_synthetic
        np.testing.assert_array_equal(np.asarray(assets.face_parts),
                                      arrs["face_parts"])
        np.testing.assert_allclose(np.asarray(assets.mean_shape),
                                   arrs["mean_shape"], atol=1e-6)

        # End-to-end forward equality with the npz-serialised fixture route.
        synth = load_synthetic_assets()
        rng = np.random.RandomState(0)
        betas = jnp.asarray(rng.randn(2, 10).astype(np.float32) * 0.5)
        out_real = smpl_forward(assets, betas)
        out_synth = smpl_forward(synth, betas)
        np.testing.assert_allclose(np.asarray(out_real.vertices),
                                   np.asarray(out_synth.vertices), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_real.joints),
                                   np.asarray(out_synth.joints), atol=2e-5)

    def test_derive_face_parts_texture_shapes(self):
        """The (1, F, ts, ts, ts, 3) nmr texture layout must reduce to (F,)
        part ids for any texture_size."""
        F = 7
        faces = np.zeros((F, 3), np.int32)
        parts = np.arange(F, dtype=np.int64) % 7
        cube = np.zeros((101, 101, 101), np.float64)
        for p in range(7):
            cube[10 * p, 10 * p, 10 * p] = p
        for ts in (1, 2, 3):
            tex = np.zeros((1, F, ts, ts, ts, 3), np.float32)
            tex += ((parts * 10 + 0.5) / 100.0)[None, :, None, None, None,
                                                None]
            got = derive_face_parts_from_cube(faces, tex, cube)
            assert got.shape == (F,), got.shape
            np.testing.assert_array_equal(got, parts)
        # Already-flat (F, 3) colours work too.
        flat = np.zeros((F, 3), np.float32) + \
            ((parts * 10 + 0.5) / 100.0)[:, None]
        np.testing.assert_array_equal(
            derive_face_parts_from_cube(faces, flat, cube), parts)


class TestDetectron2PklFormat:
    def test_load_d2_pkl_matches_in_memory_conversion(self, tmp_path):
        torch = pytest.importorskip("torch")  # noqa: F841
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from torch_twin_d2 import D2KeypointRCNNTwin, twin_state_to_d2

        from straps_tpu.perception.convert_d2 import (
            convert_d2_state, load_d2_pkl,
        )

        twin = D2KeypointRCNNTwin()
        state = twin_state_to_d2(twin)
        # Model-zoo pkls: {'model': {name: float32 ndarray}, '__author__'}.
        path = tmp_path / "keypoint_rcnn_R_50_FPN.pkl"
        with open(path, "wb") as f:
            pickle.dump({"model": state,
                         "__author__": "Detectron2 Model Zoo",
                         "matching_heuristics": True}, f, protocol=2)

        from_file = load_d2_pkl(str(path))
        in_memory = convert_d2_state(state)
        flat_f = jax.tree_util.tree_leaves_with_path(from_file)
        flat_m = jax.tree_util.tree_leaves_with_path(in_memory)
        assert len(flat_f) == len(flat_m) > 50
        for (pf, vf), (pm, vm) in zip(flat_f, flat_m):
            assert pf == pm
            np.testing.assert_array_equal(np.asarray(vf), np.asarray(vm))


class TestReferenceTarFormat:
    def test_load_reference_checkpoint_round_trip(self, tmp_path):
        torch = pytest.importorskip("torch")

        from straps_tpu.models import (
            build_regressor, flax_to_torch_state_dict,
            load_reference_checkpoint,
        )

        mean_pose = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), 24)
        model = build_regressor(mean_pose, np.zeros(10, np.float32))
        variables = model.init(jax.random.PRNGKey(7),
                               jnp.zeros((1, 64, 64, 18)), train=False)
        variables = jax.tree_util.tree_map(np.asarray, variables)
        sd = flax_to_torch_state_dict(variables)
        tsd = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in sd.items()}
        # The reference checkpoint dict layout
        # (`train_synthetic_otf_rendering.py:365-380`):
        path = tmp_path / "straps_model_checkpoint.tar"
        torch.save({"epoch": 42,
                    "best_epoch": 40,
                    "model_state_dict": tsd,
                    "best_model_state_dict": tsd,
                    "optimiser_state_dict": {},
                    "criterion_state_dict": {},
                    "best_epoch_val_metrics": {"pves_pa": 0.058}},
                   str(path))

        restored = load_reference_checkpoint(str(path))
        for coll in ("params", "batch_stats"):
            ref_flat = jax.tree_util.tree_leaves_with_path(variables[coll])
            got_flat = jax.tree_util.tree_leaves_with_path(restored[coll])
            assert len(ref_flat) == len(got_flat) > 10, coll
            for (pr, vr), (pg, vg) in zip(ref_flat, got_flat):
                assert pr == pg
                np.testing.assert_allclose(np.asarray(vg), np.asarray(vr),
                                           atol=1e-6)

        # And the converted variables actually run.
        out = model.apply(restored, jnp.zeros((1, 64, 64, 18)), train=False)
        assert all(np.all(np.isfinite(np.asarray(o))) for o in out)


class TestUVSymmetryMatFormat:
    def test_load_uv_symmetry_mat(self, tmp_path):
        scipy_io = pytest.importorskip("scipy.io")

        from straps_tpu.perception.densepose_structures import (
            DensePoseTransformData, N_PART_LABELS, load_transform_data,
        )

        rng = np.random.RandomState(0)
        u_tabs = [rng.rand(256, 256).astype(np.float64)
                  for _ in range(N_PART_LABELS)]
        v_tabs = [rng.rand(256, 256).astype(np.float64)
                  for _ in range(N_PART_LABELS)]
        # MATLAB cell arrays round-trip through savemat as (1, N) object
        # arrays — the layout `DensePoseTransformData.load` indexes.
        u_cell = np.empty((1, N_PART_LABELS), dtype=object)
        v_cell = np.empty((1, N_PART_LABELS), dtype=object)
        for i in range(N_PART_LABELS):
            u_cell[0, i] = u_tabs[i]
            v_cell[0, i] = v_tabs[i]
        path = tmp_path / "UV_symmetry_transforms.mat"
        scipy_io.savemat(str(path), {"U_transforms": u_cell,
                                     "V_transforms": v_cell})

        td = DensePoseTransformData.load(str(path))
        assert len(td.uv_symmetries["U_transforms"]) == N_PART_LABELS
        for i in range(N_PART_LABELS):
            np.testing.assert_allclose(
                td.uv_symmetries["U_transforms"][i],
                u_tabs[i].astype(np.float32), atol=1e-7)
            np.testing.assert_allclose(
                td.uv_symmetries["V_transforms"][i],
                v_tabs[i].astype(np.float32), atol=1e-7)

        # Dispatcher picks the real file when present.
        td2 = load_transform_data(str(path))
        np.testing.assert_allclose(td2.uv_symmetries["V_transforms"][3],
                                   v_tabs[3].astype(np.float32), atol=1e-7)
