"""Encoder + IEF composition: proxy representation -> SMPL params + camera.

Equivalent surface to the reference `SingleInputRegressor`
(`models/regressor.py:7-47`), NHWC input.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from straps_tpu.models.ief import IEFModule, make_initial_params_estimate
from straps_tpu.models.resnet import (
    ResNetEncoder, BasicBlock, DEPTH_CONFIGS,
)


class SingleInputRegressor(nn.Module):
    """Attributes mirror the reference constructor:
      in_channels: proxy channels (1 + num joints = 18 for STRAPS).
      resnet_layers: 18 or 50.
      ief_iters: refinement iterations.
      initial_estimate: static (157,) IEF init vector.
    """
    in_channels: int = 18
    resnet_layers: int = 18
    ief_iters: int = 3
    initial_estimate: tuple = ()
    # Encoder computation dtype ('bfloat16' runs the convs at MXU rate;
    # params, IEF head and outputs stay float32).
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, proxy, train: bool = True):
        """proxy: (B, H, W, C) NHWC -> (cam (B,3), pose6d (B,144), shape (B,10))."""
        dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        # The reference regressor wires only 18/50 (`models/regressor.py:
        # 28-41`: fc [512,512] for R18, [1024,1024] for R50); the other
        # torchvision depths exist as encoder constructors on both sides.
        # Here every depth is reachable, with the fc rule generalised by
        # block family.
        if self.resnet_layers not in DEPTH_CONFIGS:
            raise ValueError(f"Unsupported resnet_layers={self.resnet_layers}")
        block, layers = DEPTH_CONFIGS[self.resnet_layers]
        encoder = ResNetEncoder(block=block, layers=layers,
                                dtype=dtype, name="encoder")
        fc_neurons = (512, 512) if block is BasicBlock else (1024, 1024)
        feats = encoder(proxy, train=train)
        return IEFModule(fc_neurons=fc_neurons, iterations=self.ief_iters,
                         initial_estimate=self.initial_estimate,
                         name="ief")(feats)


def build_regressor(mean_pose_6d: np.ndarray, mean_shape: np.ndarray,
                    in_channels: int = 18, resnet_layers: int = 18,
                    ief_iters: int = 3,
                    compute_dtype: Optional[str] = None) -> SingleInputRegressor:
    init = make_initial_params_estimate(mean_pose_6d, mean_shape)
    return SingleInputRegressor(in_channels=in_channels,
                                resnet_layers=resnet_layers,
                                ief_iters=ief_iters,
                                initial_estimate=tuple(init.tolist()),
                                compute_dtype=compute_dtype)
