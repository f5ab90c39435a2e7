"""SMPL asset container + loaders (real files or synthetic fixture).

Real-file layout matches the reference (`config.py:3-10`): a directory with
`SMPL_NEUTRAL.pkl` (or gendered variants) in smplx/chumpy-stripped format,
plus `J_regressor_extra.npy`, `cocoplus_regressor.npy`,
`J_regressor_h36m.npy`.  Per-face part ids replace the reference's
`vertex_texture.npy`/`cube_parts.npy` colour-cube decode
(`renderers/nmr_renderer.py:37-55,93-101`): we derive an explicit
(F,)-int part-id array instead — see `derive_face_parts_from_cube`.
"""

import os
import pickle
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from straps_tpu import constants as C
from straps_tpu.smpl.fixtures import generate_synthetic_smpl_arrays

_SYNTHETIC_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "assets", "synthetic_smpl.npz")


@dataclass(frozen=True)
class SmplAssets:
    """All body-model tensors as jnp arrays.

    Registered as a jax pytree: tensor fields are leaves (so the whole bundle
    can be device_put / donated / sharded), while the trace-time-static
    fields (kinematic parents, IEF mean params) are hashable aux data.
    """
    v_template: jnp.ndarray        # (V, 3)
    shapedirs: jnp.ndarray         # (V, 3, n_betas)
    posedirs: jnp.ndarray          # (23*9, V*3)
    J_regressor: jnp.ndarray       # (24, V)
    lbs_weights: jnp.ndarray       # (V, 24)
    faces: jnp.ndarray             # (F, 3) int32
    parents: tuple                 # (24,) ints — static, used at trace time
    J_regressor_extra: jnp.ndarray     # (9, V)
    J_regressor_cocoplus: jnp.ndarray  # (19, V)
    J_regressor_h36m: jnp.ndarray      # (17, V)
    face_parts: jnp.ndarray        # (F,) int32 body-part id per face
    mean_pose_6d: tuple            # (144,) static init for IEF
    mean_shape: tuple              # (10,) static init for shape augmentation
    is_synthetic: bool = False

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_faces(self) -> int:
        return self.faces.shape[0]


def _to_assets(d: dict, dtype=jnp.float32, is_synthetic: bool = False) -> SmplAssets:
    j = lambda k: jnp.asarray(np.asarray(d[k]), dtype=dtype)
    # The Pallas rasteriser packs part ids into the depth's low mantissa
    # bits (render/pallas_raster.py ATTR_BITS); guard the range while the
    # array is still concrete.
    fp = np.asarray(d["face_parts"])
    if fp.min() < 0 or fp.max() > 7:
        raise ValueError(f"face_parts must be in [0, 7], got "
                         f"[{fp.min()}, {fp.max()}]")
    return SmplAssets(
        v_template=j("v_template"),
        shapedirs=j("shapedirs"),
        posedirs=j("posedirs"),
        J_regressor=j("J_regressor"),
        lbs_weights=j("lbs_weights"),
        faces=jnp.asarray(np.asarray(d["faces"]), dtype=jnp.int32),
        parents=tuple(int(x) for x in np.asarray(d["parents"])),
        J_regressor_extra=j("J_regressor_extra"),
        J_regressor_cocoplus=j("J_regressor_cocoplus"),
        J_regressor_h36m=j("J_regressor_h36m"),
        face_parts=jnp.asarray(np.asarray(d["face_parts"]), dtype=jnp.int32),
        mean_pose_6d=tuple(float(x) for x in np.asarray(d["mean_pose_6d"])),
        mean_shape=tuple(float(x) for x in np.asarray(d["mean_shape"])),
        is_synthetic=is_synthetic,
    )


def _dense(x) -> np.ndarray:
    """Densify scipy sparse matrices found in SMPL pkls."""
    if hasattr(x, "todense"):
        return np.asarray(x.todense())
    return np.asarray(x)


def load_smpl_pkl(pkl_path: str) -> dict:
    """Parse a chumpy-stripped SMPL pickle into plain numpy arrays."""
    with open(pkl_path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    v_template = np.asarray(data["v_template"], dtype=np.float32)
    shapedirs = np.asarray(data["shapedirs"], dtype=np.float32)[:, :, :C.NUM_BETAS]
    posedirs = np.asarray(data["posedirs"], dtype=np.float32)
    # smplx convention: posedirs reshaped to (V*3, 207) then transposed.
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
    J_regressor = _dense(data["J_regressor"]).astype(np.float32)
    lbs_weights = np.asarray(data["weights"], dtype=np.float32)
    faces = np.asarray(data["f"], dtype=np.int32)
    parents = np.asarray(data["kintree_table"][0], dtype=np.int64)
    parents[0] = -1
    return {
        "v_template": v_template, "shapedirs": shapedirs, "posedirs": posedirs,
        "J_regressor": J_regressor, "lbs_weights": lbs_weights, "faces": faces,
        "parents": parents.astype(np.int32),
    }


def derive_face_parts_from_cube(faces: np.ndarray, vertex_texture: np.ndarray,
                                cube_parts: np.ndarray) -> np.ndarray:
    """Derive per-face part ids from the reference's colour-cube assets.

    The reference renders each face with a constant colour
    (`vertex_texture.npy`) and decodes the part id by flooring 100*rgb into
    the `cube_parts.npy` LUT (`renderers/nmr_renderer.py:93-101`).  The
    composition of the two is a static per-face part id, so we precompute it
    once instead of decoding per pixel per step.
    """
    # vertex_texture: (1, F, ts, ts, ts, 3), constant colour per face — take
    # texture sample (0, 0, 0) of each face.  Flattening keeps the ts^3
    # samples of one face contiguous, so reshape (F, ts^3, 3) is exact.
    n_faces = int(np.asarray(faces).shape[0])
    tex = np.asarray(vertex_texture, dtype=np.float64).reshape(-1, 3)
    if tex.shape[0] != n_faces:
        if tex.shape[0] % n_faces != 0:
            raise ValueError(
                f"vertex_texture has {tex.shape[0]} colour samples, not a "
                f"multiple of {n_faces} faces")
        tex = tex.reshape(n_faces, -1, 3)[:, 0, :]
    idx = np.floor(100.0 * tex).astype(np.int64)
    cp = np.asarray(cube_parts)
    np.clip(idx, 0, np.asarray(cp.shape)[None, :] - 1, out=idx)
    return cp[idx[:, 0], idx[:, 1], idx[:, 2]].astype(np.int32)


def load_assets(smpl_dir: Optional[str] = None,
                gender: str = "neutral",
                dtype=jnp.float32) -> SmplAssets:
    """Load real SMPL assets from `smpl_dir` if present, else the synthetic
    fixture (cached in assets/synthetic_smpl.npz)."""
    if smpl_dir is not None:
        pkl = os.path.join(smpl_dir, f"SMPL_{gender.upper()}.pkl")
        if os.path.exists(pkl):
            d = load_smpl_pkl(pkl)
            root = os.path.dirname(smpl_dir.rstrip("/"))
            for key, fname in [("J_regressor_extra", "J_regressor_extra.npy"),
                               ("J_regressor_cocoplus", "cocoplus_regressor.npy"),
                               ("J_regressor_h36m", "J_regressor_h36m.npy")]:
                path = os.path.join(root, fname)
                if not os.path.exists(path):
                    raise FileNotFoundError(
                        f"{path} is required alongside {pkl}: the 90-joint "
                        f"superset needs the three extra joint regressors "
                        f"(reference layout `additional/<*.npy>` next to "
                        f"`additional/smpl/`, `models/smpl_official.py:17-19`)")
                d[key] = np.load(path).astype(np.float32)
            vt_path = os.path.join(root, "vertex_texture.npy")
            cp_path = os.path.join(root, "cube_parts.npy")
            if os.path.exists(vt_path) and os.path.exists(cp_path):
                d["face_parts"] = derive_face_parts_from_cube(
                    d["faces"], np.load(vt_path), np.load(cp_path))
            else:
                joint_part = np.asarray(C.SMPL_JOINT_TO_PART, dtype=np.int32)
                vert_part = joint_part[np.argmax(d["lbs_weights"], axis=1)]
                d["face_parts"] = vert_part[d["faces"][:, 0]].astype(np.int32)
            mp_path = os.path.join(root, "neutral_smpl_mean_params_6dpose.npz")
            if os.path.exists(mp_path):
                mp = np.load(mp_path)
                d["mean_pose_6d"] = mp["pose"].astype(np.float32)
                d["mean_shape"] = mp["shape"].astype(np.float32)
            else:
                d["mean_pose_6d"] = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), 24)
                d["mean_shape"] = np.zeros(C.NUM_BETAS, np.float32)
            return _to_assets(d, dtype=dtype, is_synthetic=False)
    return load_synthetic_assets(dtype=dtype)


def load_synthetic_assets(dtype=jnp.float32, seed: int = 0) -> SmplAssets:
    """Synthetic fixture, cached on disk for fast repeat loading."""
    if seed == 0 and os.path.exists(_SYNTHETIC_CACHE):
        d = dict(np.load(_SYNTHETIC_CACHE))
    else:
        d = generate_synthetic_smpl_arrays(seed=seed)
        if seed == 0:
            os.makedirs(os.path.dirname(_SYNTHETIC_CACHE), exist_ok=True)
            np.savez_compressed(_SYNTHETIC_CACHE, **d)
    return _to_assets(d, dtype=dtype, is_synthetic=True)


jax.tree_util.register_dataclass(
    SmplAssets,
    data_fields=["v_template", "shapedirs", "posedirs", "J_regressor",
                 "lbs_weights", "faces", "J_regressor_extra",
                 "J_regressor_cocoplus", "J_regressor_h36m", "face_parts"],
    meta_fields=["parents", "mean_pose_6d", "mean_shape", "is_synthetic"],
)
