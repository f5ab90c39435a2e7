"""ResNet-FPN backbone for the detection stack.

Architecture mirrors the detectron2 GeneralizedRCNN backbone the reference's
detectors run on (Keypoint-RCNN R50-FPN / PointRend R50-FPN,
`predict/predict_3D.py:35-64`): ResNet stages res2..res5 -> 1x1 laterals ->
top-down nearest 2x upsampling -> 3x3 output convs -> P2..P5, plus P6 =
stride-2 maxpool of P5 for the RPN.  NHWC throughout.
"""

from typing import Any, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp

from straps_tpu.models.resnet import ResNetEncoder, Bottleneck


class FPN(nn.Module):
    out_channels: int = 256
    dtype: Any = None        # computation dtype (params stay float32)

    @nn.compact
    def __call__(self, stages: Dict[str, jnp.ndarray]) -> List[jnp.ndarray]:
        names = ["res2", "res3", "res4", "res5"]
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{i + 2}")(
                stages[n]) for i, n in enumerate(names)]
        # Top-down pathway: upsample coarser map 2x (nearest) and add.
        merged = [None] * 4
        merged[3] = laterals[3]
        for i in (2, 1, 0):
            up = jax.image.resize(merged[i + 1], laterals[i].shape,
                                  method="nearest")
            merged[i] = laterals[i] + up
        outputs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"output{i + 2}")(m) for i, m in enumerate(merged)]
        # P6 for RPN: stride-2 maxpool of P5.
        p6 = nn.max_pool(outputs[3], (1, 1), strides=(2, 2))
        # Heads/ROIAlign/NMS always run f32 regardless of backbone dtype.
        return [o.astype(jnp.float32) for o in outputs + [p6]]


class ResNet50FPN(nn.Module):
    """Full detection backbone: image (B, H, W, 3) -> [P2, P3, P4, P5, P6].

    `depth` 50 or 101 (the reference's DensePose model is R101-FPN,
    `DensePose/configs`)."""
    out_channels: int = 256
    depth: int = 50
    # 'bfloat16' runs the backbone+FPN convs at MXU rate (params stay f32,
    # features returned f32).  Off by default: detector parity vs the torch
    # twin is asserted in f32; bf16 shifts features ~1e-2 relative.
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        layers = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[self.depth]
        dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        # All reference detector checkpoints are MSRA/caffe2-style
        # (RESNETS.STRIDE_IN_1X1=True): stride lives on conv1.
        stages = ResNetEncoder(block=Bottleneck, layers=layers,
                               return_stages=True, stride_in_1x1=True,
                               dtype=dtype, name="bottom_up")(
            images, train=train)
        return FPN(out_channels=self.out_channels, dtype=dtype,
                   name="fpn")(stages)


FPN_STRIDES = (4, 8, 16, 32, 64)
