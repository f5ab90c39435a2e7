"""Body model: asset loading + pure-JAX SMPL forward."""

from straps_tpu.smpl.assets import SmplAssets, load_assets, load_synthetic_assets
from straps_tpu.smpl.model import SmplOutput, smpl_forward, smpl_forward_axis_angle

__all__ = [
    "SmplAssets", "load_assets", "load_synthetic_assets",
    "SmplOutput", "smpl_forward", "smpl_forward_axis_angle",
]
