"""One-command real-assets acceptance gate.

The day the reference's licensed assets become available
(`/root/reference/run_predict.py:15-19`: `straps_model_checkpoint.tar`,
`additional/smpl/SMPL_*.pkl`, detectron2 zoo pkls), this command proves
accuracy parity in one shot: it runs every converter, cross-checks the SMPL
forward against an independent numpy oracle, executes the demo predict
pipeline, optionally diffs the outputs against a reference-generated
directory, and prints a named-tolerance PASS/FAIL table — exiting nonzero
on any FAIL.

    python -m straps_tpu.cli.run_parity_gate \
        --smpl-dir additional/smpl \
        --checkpoint checkpoints/straps_model_checkpoint.tar \
        --keypoint-checkpoint keypoint_rcnn_R_50_FPN.pkl \
        --silhouette-checkpoint pointrend_rcnn_R_50_fpn.pkl \
        --densepose-checkpoint densepose_rcnn_R_101_fpn_s1x.pkl \
        --input demo_proxies/ --expected reference_outputs/

Tolerances follow BASELINE.json's north star ("bit-comparable SMPL outputs,
<=1mm PVE delta"). The whole gate is rehearsed end to end on synthetic
stand-ins written in the real on-disk formats by `tests/test_parity_gate.py`.
"""

import argparse
import glob
import os
import sys
from typing import List, Optional, Tuple

import numpy as np

# (name, status, detail, tolerance) rows for the final table.
GateRow = Tuple[str, bool, str, str]

PVE_TOL_MM = 1.0            # BASELINE.json: <=1mm PVE delta vs reference
ORACLE_TOL_M = 1e-4         # SMPL forward vs independent numpy LBS: 0.1mm
SHAPE_TOL = 1e-2            # max |delta beta|
POSE_TOL = 1e-3             # max |delta rotmat element|
CAM_TOL = 1e-3              # max |delta weak-perspective cam param|


def _numpy_lbs_oracle(assets, betas: np.ndarray,
                      rotmats: np.ndarray) -> np.ndarray:
    """Independent single-sample SMPL LBS written from the paper equations
    (Loper et al. 2015, eq. 1-7) — same oracle as `tests/test_smpl.py`,
    embedded so the gate is self-contained when shipped without tests/."""
    v_template = np.asarray(assets.v_template, np.float64)
    shapedirs = np.asarray(assets.shapedirs, np.float64)
    posedirs = np.asarray(assets.posedirs, np.float64)
    J_reg = np.asarray(assets.J_regressor, np.float64)
    W = np.asarray(assets.lbs_weights, np.float64)
    parents = np.asarray(assets.parents)

    v_shaped = v_template + shapedirs @ np.asarray(betas, np.float64)
    J = J_reg @ v_shaped
    pose_feat = (np.asarray(rotmats, np.float64)[1:]
                 - np.eye(3)).reshape(-1)
    v_posed = v_shaped + (pose_feat @ posedirs).reshape(-1, 3)

    G = np.zeros((24, 4, 4))
    G[0] = np.eye(4)
    G[0, :3, :3] = rotmats[0]
    G[0, :3, 3] = J[0]
    for j in range(1, 24):
        local = np.eye(4)
        local[:3, :3] = rotmats[j]
        local[:3, 3] = J[j] - J[parents[j]]
        G[j] = G[parents[j]] @ local
    A = G.copy()
    for j in range(24):
        A[j, :3, 3] -= G[j, :3, :3] @ J[j]
    T = np.einsum("vj,jpq->vpq", W, A)
    return np.einsum("vpq,vq->vp", T[:, :3, :3], v_posed) + T[:, :3, 3]


def gate_smpl_assets(smpl_dir: Optional[str], rows: List[GateRow]):
    """Load the SMPL asset directory through every real-format parser
    (`smpl/assets.py::load_assets` — chumpy-stripped pkl, regressor npys,
    mean-params npz, colour-cube part derivation)."""
    from straps_tpu.smpl import load_assets

    try:
        assets = load_assets(smpl_dir)
    except Exception as e:  # noqa: BLE001 — gate reports, never raises
        rows.append(("smpl_assets_load", False, f"{type(e).__name__}: {e}",
                     "loads"))
        return None
    if smpl_dir is not None and assets.is_synthetic:
        # load_assets falls back to the synthetic fixture when the pkl is
        # absent — a convenience for the library, but a FAIL for a gate the
        # user pointed at a real directory.
        rows.append(("smpl_assets_load", False,
                     f"no SMPL_NEUTRAL.pkl under {smpl_dir} "
                     "(fell back to synthetic fixture)", "loads"))
        return None
    leaves = [assets.v_template, assets.shapedirs, assets.posedirs,
              assets.J_regressor, assets.lbs_weights,
              assets.J_regressor_extra, assets.J_regressor_cocoplus,
              assets.J_regressor_h36m]
    finite = all(bool(np.all(np.isfinite(np.asarray(x)))) for x in leaves)
    detail = (f"V={assets.num_verts} F={assets.num_faces} "
              f"synthetic={assets.is_synthetic}")
    rows.append(("smpl_assets_load", finite, detail, "loads, all finite"))
    return assets


def gate_smpl_oracle(assets, rows: List[GateRow]):
    """Cross-check `smpl_forward` on the loaded assets against the
    independent numpy LBS oracle at a fixed nontrivial pose."""
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation as ScipyRotation

    from straps_tpu.smpl import smpl_forward

    rng = np.random.RandomState(11)
    betas = rng.randn(10).astype(np.float32) * 0.5
    aa = rng.randn(24, 3).astype(np.float32) * 0.3
    rotmats = ScipyRotation.from_rotvec(aa).as_matrix().astype(np.float32)

    out = smpl_forward(assets, jnp.asarray(betas)[None],
                       jnp.asarray(rotmats[1:])[None],
                       jnp.asarray(rotmats[0:1])[None])
    want = _numpy_lbs_oracle(assets, betas, rotmats)
    err_m = float(np.abs(np.asarray(out.vertices)[0] - want).max())
    rows.append(("smpl_forward_oracle", err_m <= ORACLE_TOL_M,
                 f"max vertex err {err_m:.2e} m",
                 f"<= {ORACLE_TOL_M:.0e} m"))


def gate_regressor_checkpoint(checkpoint: Optional[str], assets,
                              resnet_layers: int, rows: List[GateRow]):
    """Convert the reference `.tar` (or load an orbax dir), run a forward,
    and round-trip flax -> torch state dict -> flax exactly."""
    import jax
    import jax.numpy as jnp

    from straps_tpu.config import PredictConfig
    from straps_tpu.models import (
        flax_to_torch_state_dict, torch_state_dict_to_flax,
    )
    from straps_tpu.predict.pipeline import load_regressor_variables

    if checkpoint is None:
        rows.append(("regressor_checkpoint", True, "skipped (not provided)",
                     "-"))
        return
    cfg = PredictConfig(checkpoint=checkpoint)
    cfg.model.resnet_layers = resnet_layers
    try:
        # The pipeline's own loader: reference .tar via the torch converter,
        # orbax dirs via PyTreeCheckpointer (+ heatmap-mode metadata).
        model, variables, mode = load_regressor_variables(cfg, assets)
    except Exception as e:  # noqa: BLE001
        rows.append(("regressor_checkpoint", False,
                     f"{type(e).__name__}: {e}", "converts"))
        return
    out = model.apply(variables, jnp.zeros((1, 256, 256, 18)), train=False)
    finite = all(bool(np.all(np.isfinite(np.asarray(o)))) for o in out)
    n_params = sum(int(np.asarray(x).size) for x in
                   jax.tree_util.tree_leaves(variables["params"]))
    rows.append(("regressor_checkpoint", finite,
                 f"{n_params / 1e6:.1f}M params, heatmap_mode={mode}, "
                 "forward finite",
                 "converts, forward finite"))

    # Lossless round-trip: flax -> torch layout -> flax.
    back = torch_state_dict_to_flax(flax_to_torch_state_dict(variables))
    ok = True
    want = jax.tree_util.tree_leaves_with_path(
        {k: variables[k] for k in ("params", "batch_stats")})
    got = jax.tree_util.tree_leaves_with_path(
        {k: back[k] for k in ("params", "batch_stats")})
    ok = len(want) == len(got)
    for (pw, vw), (pg, vg) in zip(want, got):
        ok = ok and pw == pg and np.array_equal(np.asarray(vw),
                                                np.asarray(vg))
    rows.append(("regressor_roundtrip", ok,
                 f"{len(want)} tensors bit-identical" if ok else "mismatch",
                 "flax->torch->flax exact"))


def gate_detector_checkpoint(path: Optional[str], model, name: str,
                             rows: List[GateRow]):
    """Convert a detectron2 pkl and require its variable tree to match the
    flax model's init structure exactly (every weight mapped, every shape
    right) — the conversion-coverage check that needs no 800^2 forward."""
    import jax
    import jax.numpy as jnp

    from straps_tpu.perception import load_d2_pkl

    if path is None:
        rows.append((name, True, "skipped (not provided)", "-"))
        return
    try:
        converted = load_d2_pkl(path)
    except Exception as e:  # noqa: BLE001
        rows.append((name, False, f"{type(e).__name__}: {e}", "converts"))
        return
    # Param shapes are image-size independent; init tiny to stay cheap.
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((64, 64, 3)))
    ok, n, bad = True, 0, ""
    for coll in ("params", "batch_stats"):
        want = jax.tree_util.tree_leaves_with_path(init[coll])
        got = jax.tree_util.tree_leaves_with_path(converted.get(coll, {}))
        if len(want) != len(got):
            ok, bad = False, (f"{coll}: {len(got)} converted vs "
                              f"{len(want)} expected tensors")
            break
        for (pw, vw), (pg, vg) in zip(want, got):
            n += 1
            if pw != pg or np.asarray(vw).shape != np.asarray(vg).shape:
                ok, bad = False, f"{coll}{jax.tree_util.keystr(pw)}"
                break
    rows.append((name, ok,
                 f"{n} tensors structure+shape match" if ok else bad,
                 "tree == model.init"))


def gate_demo_predict(cfg, save_vis: bool, rows: List[GateRow]):
    """Run the full predict pipeline (the reference's `run_predict.py`
    surface) and require finite outputs on disk."""
    from straps_tpu.predict import predict_3d

    try:
        out = predict_3d(cfg, save_vis=save_vis)
    except Exception as e:  # noqa: BLE001
        rows.append(("demo_predict", False, f"{type(e).__name__}: {e}",
                     "runs"))
        return None
    finite = all(bool(np.all(np.isfinite(np.asarray(out[k]))))
                 for k in ("verts", "shape", "pose_rotmats", "cam_wp"))
    n_npy = len(glob.glob(os.path.join(cfg.out_dir, "*_verts.npy")))
    rows.append(("demo_predict", finite and n_npy == len(out["names"]),
                 f"{len(out['names'])} images -> {n_npy} verts.npy, finite",
                 "runs, outputs finite"))
    return out


def gate_expected_outputs(out_dir: str, expected_dir: str,
                          rows: List[GateRow]):
    """Diff our predict outputs against a reference-generated directory
    (the reference writes `<name>_verts.npy` etc.,
    `predict/predict_3D.py:157-183`). PVE tolerance is BASELINE.json's
    <=1mm north star."""
    specs = [("verts", PVE_TOL_MM, "pve_mm"),
             ("shape", SHAPE_TOL, "max_abs"),
             ("pose_rotmats", POSE_TOL, "max_abs"),
             ("cam_wp", CAM_TOL, "max_abs")]
    for suffix, tol, kind in specs:
        exp_files = sorted(glob.glob(os.path.join(expected_dir,
                                                  f"*_{suffix}.npy")))
        if not exp_files:
            rows.append((f"expected_{suffix}", True,
                         "skipped (no files in --expected)", "-"))
            continue
        worst, missing = 0.0, 0
        for ef in exp_files:
            ours = os.path.join(out_dir, os.path.basename(ef))
            if not os.path.exists(ours):
                missing += 1
                continue
            want, got = np.load(ef), np.load(ours)
            if want.shape != got.shape:
                missing += 1
                continue
            if kind == "pve_mm":
                err = float(np.linalg.norm(got - want, axis=-1).mean() * 1e3)
            else:
                err = float(np.abs(got - want).max())
            worst = max(worst, err)
        unit = " mm" if kind == "pve_mm" else ""
        ok = missing == 0 and worst <= tol
        detail = (f"{len(exp_files)} files, worst {worst:.4g}{unit}"
                  + (f", {missing} missing/mismatched" if missing else ""))
        rows.append((f"expected_{suffix}", ok, detail, f"<= {tol}{unit}"))


def print_table(rows: List[GateRow]) -> bool:
    name_w = max(len(r[0]) for r in rows)
    det_w = max(len(r[2]) for r in rows)
    print(f"{'gate':<{name_w}}  status  {'detail':<{det_w}}  tolerance")
    print("-" * (name_w + det_w + 30))
    all_ok = True
    for name, ok, detail, tol in rows:
        all_ok = all_ok and ok
        print(f"{name:<{name_w}}  {'PASS' if ok else 'FAIL':<6}  "
              f"{detail:<{det_w}}  {tol}")
    print("-" * (name_w + det_w + 30))
    print("PARITY GATE:", "PASS" if all_ok else "FAIL")
    return all_ok


def build_parser():
    p = argparse.ArgumentParser(
        description="Real-assets acceptance gate: convert + verify parity")
    p.add_argument("--smpl-dir", default=None,
                   help="reference additional/smpl directory (synthetic "
                        "fixture when omitted)")
    p.add_argument("--checkpoint", default=None,
                   help="reference straps_model_checkpoint.tar or orbax dir")
    p.add_argument("--keypoint-checkpoint", default=None,
                   help="detectron2 Keypoint-RCNN pkl")
    p.add_argument("--silhouette-checkpoint", default=None,
                   help="detectron2 PointRend pkl")
    p.add_argument("--densepose-checkpoint", default=None,
                   help="detectron2 DensePose R101 pkl")
    p.add_argument("--input", default=None,
                   help="demo input dir (cached proxies or images); demo "
                        "predict is skipped when omitted")
    p.add_argument("--silh-from", default="cached",
                   choices=["cached", "pointrend", "densepose"])
    p.add_argument("--expected", default=None,
                   help="reference-generated output dir to diff against "
                        "(<name>_verts.npy etc.)")
    p.add_argument("--out-dir", default="parity_gate_out")
    p.add_argument("--img-wh", type=int, default=256)
    p.add_argument("--resnet-layers", type=int, default=18)
    return p


def main(argv=None) -> int:
    from straps_tpu.utils.profiling import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    args = build_parser().parse_args(argv)
    rows: List[GateRow] = []

    assets = gate_smpl_assets(args.smpl_dir, rows)
    if assets is not None:
        gate_smpl_oracle(assets, rows)
        gate_regressor_checkpoint(args.checkpoint, assets,
                                  args.resnet_layers, rows)

    if any([args.keypoint_checkpoint, args.silhouette_checkpoint,
            args.densepose_checkpoint]):
        from straps_tpu.perception.rcnn import (
            DensePoseRCNN, KeypointRCNN, PointRendRCNN,
        )
        gate_detector_checkpoint(args.keypoint_checkpoint, KeypointRCNN(),
                                 "keypoint_rcnn_convert", rows)
        gate_detector_checkpoint(args.silhouette_checkpoint, PointRendRCNN(),
                                 "pointrend_convert", rows)
        gate_detector_checkpoint(args.densepose_checkpoint, DensePoseRCNN(),
                                 "densepose_convert", rows)

    if args.input is not None and assets is not None:
        from straps_tpu.config import PredictConfig

        cfg = PredictConfig(
            input_dir=args.input, checkpoint=args.checkpoint,
            silhouettes_from=args.silh_from, out_dir=args.out_dir,
            smpl_dir=args.smpl_dir, img_wh=args.img_wh,
            keypoint_checkpoint=args.keypoint_checkpoint,
            silhouette_checkpoint=(args.silhouette_checkpoint
                                   if args.silh_from == "pointrend"
                                   else args.densepose_checkpoint
                                   if args.silh_from == "densepose"
                                   else args.silhouette_checkpoint))
        cfg.model.resnet_layers = args.resnet_layers
        out = gate_demo_predict(cfg, save_vis=False, rows=rows)
        if out is not None and args.expected is not None:
            gate_expected_outputs(args.out_dir, args.expected, rows)
    elif args.expected is not None:
        rows.append(("expected_outputs", False,
                     "--expected given but no --input to predict from",
                     "-"))

    return 0 if print_table(rows) else 1


if __name__ == "__main__":
    sys.exit(main())
