"""Encoder + IEF composition: proxy representation -> SMPL params + camera.

Equivalent surface to the reference `SingleInputRegressor`
(`models/regressor.py:7-47`), NHWC input.
"""

from typing import Optional

import flax.linen as nn
import numpy as np

from straps_tpu.models.ief import IEFModule, make_initial_params_estimate
from straps_tpu.models.resnet import ResNetEncoder, BasicBlock, Bottleneck


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

    @nn.compact
    def __call__(self, proxy, train: bool = True):
        """proxy: (B, H, W, C) NHWC -> (cam (B,3), pose6d (B,144), shape (B,10))."""
        if self.resnet_layers == 18:
            encoder = ResNetEncoder(block=BasicBlock, layers=(2, 2, 2, 2),
                                    name="encoder")
            fc_neurons = (512, 512)
        elif self.resnet_layers == 50:
            encoder = ResNetEncoder(block=Bottleneck, layers=(3, 4, 6, 3),
                                    name="encoder")
            fc_neurons = (1024, 1024)
        else:
            raise ValueError(f"Unsupported resnet_layers={self.resnet_layers}")
        feats = encoder(proxy, train=train)
        return IEFModule(fc_neurons=fc_neurons, iterations=self.ief_iters,
                         initial_estimate=self.initial_estimate,
                         name="ief")(feats)


def build_regressor(mean_pose_6d: np.ndarray, mean_shape: np.ndarray,
                    in_channels: int = 18, resnet_layers: int = 18,
                    ief_iters: int = 3) -> SingleInputRegressor:
    init = make_initial_params_estimate(mean_pose_6d, mean_shape)
    return SingleInputRegressor(in_channels=in_channels,
                                resnet_layers=resnet_layers,
                                ief_iters=ief_iters,
                                initial_estimate=tuple(init.tolist()))
