"""Real-dataset adapters for the evaluation harness.

SSP-3D ships as an npz of labels + image/silhouette folders; 3DPW ships as
per-sequence pickles.  These adapters normalise either into the harness's
canonical dict (poses (N,72), shapes (N,10), genders (N,), optional
silhouettes/joints2D) — the formats the reference's (unshipped) eval scripts
would have consumed via `EvalMetricsTracker`
(`metrics/eval_metrics_tracker.py`).  Key aliases cover the common public
releases; silhouette/image folders are loaded through the native batch
loader when present.
"""

import glob
import os
from typing import Dict, Optional

import numpy as np

_POSE_KEYS = ("poses", "pose", "body_poses", "smpl_poses")
_SHAPE_KEYS = ("shapes", "shape", "betas", "bodyshapes", "smpl_shapes")
_GENDER_KEYS = ("genders", "gender")
_JOINTS_KEYS = ("joints2D", "joints2d", "keypoints2d")


def _first_key(data: Dict[str, np.ndarray], keys) -> Optional[str]:
    for k in keys:
        if k in data:
            return k
    return None


def normalise_gender(g) -> str:
    """-> 'm' / 'f' / 'n'.  Decodes bytes first: str(np.bytes_(b'm')) is
    "b'm'", whose first char is 'b' — silently un-gendering every sample."""
    if isinstance(g, (bytes, np.bytes_)):
        g = g.decode("utf-8", "replace")
    s = str(g).lower()[:1]
    return s if s in ("m", "f") else "n"


def load_ssp3d(labels_path: str,
               silhouette_dir: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Load an SSP-3D-style labels npz (+ optional silhouette png/npy dir).

    Returns the canonical eval dict.  Genders are normalised to
    'm'/'f'/'n' single chars.
    """
    data = dict(np.load(labels_path, allow_pickle=True))
    pk = _first_key(data, _POSE_KEYS)
    sk = _first_key(data, _SHAPE_KEYS)
    assert pk and sk, f"no pose/shape keys in {labels_path}: {list(data)}"
    out: Dict[str, np.ndarray] = {
        "poses": np.asarray(data[pk], np.float32).reshape(-1, 72),
        "shapes": np.asarray(data[sk], np.float32).reshape(-1, 10),
    }
    gk = _first_key(data, _GENDER_KEYS)
    if gk is not None:
        out["genders"] = np.asarray(
            [normalise_gender(g) for g in data[gk]])
    jk = _first_key(data, _JOINTS_KEYS)
    if jk is not None:
        out["joints2D"] = np.asarray(data[jk], np.float32)[..., :2]
    # Release-layout extras ride along untouched (the public SSP-3D
    # labels.npz also carries bbox_centres/bbox_whs/cam_trans).
    for k in ("cam_trans", "bbox_centres", "bbox_whs"):
        if k in data:
            out[k] = np.asarray(data[k], np.float32)
    if "fnames" in data:
        out["fnames"] = np.asarray([str(f) for f in data["fnames"]])
    if silhouette_dir is not None and "fnames" in out:
        sils = []
        for f in out["fnames"]:
            base = os.path.splitext(f)[0]
            npy = os.path.join(silhouette_dir, base + ".npy")
            png = os.path.join(silhouette_dir, base + ".png")
            if os.path.exists(npy):
                sils.append(np.load(npy).astype(np.float32))
            elif os.path.exists(png):
                import cv2
                sils.append((cv2.imread(png, cv2.IMREAD_GRAYSCALE) > 0)
                            .astype(np.float32))
            else:
                sils = None
                break
        if sils:
            out["silhouettes"] = np.stack(sils)
    return out


def load_eval_dataset(path: str) -> Dict[str, np.ndarray]:
    """Dispatch a `--dataset` argument to the right adapter.

    Accepts, in the shapes users actually have on disk:
      * the public SSP-3D release ROOT (the directory you unzip:
        `labels.npz` + `silhouettes/` PNG folder + `images/`) — loaded via
        `load_ssp3d` with the silhouette folder attached, which is the
        image-frame mIoU protocol input
        (`metrics/eval_metrics_tracker.py:158-178`);
      * a path to that `labels.npz` itself (a sibling `silhouettes/` dir is
        picked up automatically);
      * a 3DPW root containing `sequenceFiles/`;
      * any canonical eval npz (poses/shapes/...).
    """
    if os.path.isdir(path):
        labels = os.path.join(path, "labels.npz")
        if os.path.exists(labels):
            sil_dir = os.path.join(path, "silhouettes")
            return load_ssp3d(
                labels, sil_dir if os.path.isdir(sil_dir) else None)
        if os.path.isdir(os.path.join(path, "sequenceFiles")) or \
                glob.glob(os.path.join(path, "*.pkl")):
            return load_3dpw(path)
        raise FileNotFoundError(
            f"{path}: no labels.npz or sequenceFiles/ inside")
    if os.path.basename(path) == "labels.npz":
        sil_dir = os.path.join(os.path.dirname(path), "silhouettes")
        return load_ssp3d(path,
                          sil_dir if os.path.isdir(sil_dir) else None)
    data = dict(np.load(path, allow_pickle=True))
    assert _first_key(data, _POSE_KEYS) and _first_key(data, _SHAPE_KEYS), \
        f"eval npz needs poses/shapes; got {list(data)}"
    if "poses" in data and "shapes" in data:
        return data
    return load_ssp3d(path)   # alias normalisation


def load_3dpw(sequence_dir: str, split: str = "test",
              stride: int = 1) -> Dict[str, np.ndarray]:
    """Load 3DPW sequence pickles: <dir>/sequenceFiles/<split>/*.pkl, each
    with per-frame `poses` (F, 72), `betas` (10,), `genders` per actor.

    Frames with `campose_valid` false are dropped when the flag is present.
    """
    import pickle

    paths = sorted(glob.glob(os.path.join(
        sequence_dir, "sequenceFiles", split, "*.pkl")))
    if not paths:
        paths = sorted(glob.glob(os.path.join(sequence_dir, "*.pkl")))
    assert paths, f"no 3DPW sequence pkls under {sequence_dir}"
    poses, shapes, genders = [], [], []
    for p in paths:
        with open(p, "rb") as f:
            seq = pickle.load(f, encoding="latin1")
        n_actors = len(seq["poses"])
        for a in range(n_actors):
            pp = np.asarray(seq["poses"][a], np.float32)[::stride]
            valid = None
            if "campose_valid" in seq:
                valid = np.asarray(seq["campose_valid"][a], bool)[::stride]
                pp = pp[valid]
            beta = np.asarray(seq["betas"][a], np.float32)[:10]
            g = normalise_gender(seq.get("genders", ["n"] * n_actors)[a])
            poses.append(pp)
            shapes.append(np.tile(beta, (len(pp), 1)))
            genders.append(np.asarray([g] * len(pp)))
    return {
        "poses": np.concatenate(poses),
        "shapes": np.concatenate(shapes),
        "genders": np.concatenate(genders),
    }
