"""ResNet encoder (flax.linen), NHWC/TPU-native.

Architecturally equivalent to the reference's torchvision-derived encoder
(`models/resnet.py`: N-channel first conv, no final FC, global average pooled
feature output) but written for XLA: NHWC layout so convolutions tile
directly onto the MXU, BatchNorm statistics as flax mutable collections, and
no in-place ops.  Weight-compatible with the reference checkpoints via
`straps_tpu.models.convert`.
"""

from typing import Any, Sequence, Type, Union

import flax.linen as nn
import jax.numpy as jnp

# torch BatchNorm2d defaults: eps=1e-5, momentum=0.1 (flax momentum = 0.9).

def _bn(train: bool, name: str, dtype=None) -> nn.BatchNorm:
    return nn.BatchNorm(epsilon=1e-5, momentum=0.9, dtype=dtype,
                        use_running_average=not train, name=name)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 1
    dtype: Any = None        # computation dtype (params stay float32)

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=1, use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = _bn(train, "bn1", self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = _bn(train, "bn2", self.dtype)(out)
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = _bn(train, "downsample_bn", self.dtype)(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    dtype: Any = None        # computation dtype (params stay float32)
    # detectron2's MSRA/caffe2 ResNets (RESNETS.STRIDE_IN_1X1=True, used by
    # all the reference's detector checkpoints) stride in conv1; the
    # torchvision-style regressor encoder (reference models/resnet.py)
    # strides in conv2.
    stride_in_1x1: bool = False
    # ResNeXt/wide variants (`models/resnet.py:80-121`): grouped 3x3 conv
    # with width = planes * base_width/64 * groups.
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        s1 = self.stride if self.stride_in_1x1 else 1
        s2 = 1 if self.stride_in_1x1 else self.stride
        out = nn.Conv(width, (1, 1), strides=(s1, s1), use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = nn.relu(_bn(train, "bn1", self.dtype)(out))
        out = nn.Conv(width, (3, 3), strides=(s2, s2),
                      padding=1, use_bias=False, dtype=self.dtype,
                      feature_group_count=self.groups, name="conv2")(out)
        out = nn.relu(_bn(train, "bn2", self.dtype)(out))
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = _bn(train, "bn3", self.dtype)(out)
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = _bn(train, "downsample_bn", self.dtype)(identity)
        return nn.relu(out + identity)


class ResNetEncoder(nn.Module):
    """ResNet without the classification head; returns pooled features.

    Args mirror the reference constructors (`models/resnet.py:228-258`):
    `layers` = blocks per stage, `block` = BasicBlock (18/34) or
    Bottleneck (50+).  Input is NHWC with any channel count.
    """
    block: Type[Union[BasicBlock, Bottleneck]]
    layers: Sequence[int]
    # When True, return the dict of per-stage feature maps (res2..res5,
    # FPN/detection backbone use) instead of the pooled feature vector.
    return_stages: bool = False
    # Computation dtype (e.g. jnp.bfloat16 for MXU-rate convs); parameters
    # and the returned pooled features stay float32.
    dtype: Any = None
    # Stride placement for Bottleneck blocks (see Bottleneck.stride_in_1x1).
    stride_in_1x1: bool = False
    # Grouped/wide Bottleneck variants (resnext/wide constructors).
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(_bn(train, "bn1", self.dtype)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        planes = 64
        in_planes = 64
        stages = {}
        for stage, num_blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            for b in range(num_blocks):
                s = stride if b == 0 else 1
                needs_ds = (b == 0) and (
                    s != 1 or in_planes != planes * self.block.expansion)
                kwargs = ({"stride_in_1x1": self.stride_in_1x1,
                           "groups": self.groups,
                           "base_width": self.base_width}
                          if self.block is Bottleneck else {})
                x = self.block(planes=planes, stride=s, downsample=needs_ds,
                               dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}", **kwargs)(
                    x, train=train)
                in_planes = planes * self.block.expansion
            stages[f"res{stage + 2}"] = x
            planes *= 2
        if self.return_stages:
            return stages
        # Global average pool (adaptive avgpool to 1x1 + flatten).
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)


# The one depth -> (block, per-stage layer counts) table (torchvision's;
# `models/resnet.py:228-338`).  Consumed by the constructors below and by
# SingleInputRegressor's depth selection.
DEPTH_CONFIGS = {18: (BasicBlock, (2, 2, 2, 2)),
                 34: (BasicBlock, (3, 4, 6, 3)),
                 50: (Bottleneck, (3, 4, 6, 3)),
                 101: (Bottleneck, (3, 4, 23, 3)),
                 152: (Bottleneck, (3, 8, 36, 3))}


def resnet18() -> ResNetEncoder:
    return ResNetEncoder(block=DEPTH_CONFIGS[18][0], layers=DEPTH_CONFIGS[18][1])


def resnet34() -> ResNetEncoder:
    return ResNetEncoder(block=DEPTH_CONFIGS[34][0], layers=DEPTH_CONFIGS[34][1])


def resnet50() -> ResNetEncoder:
    return ResNetEncoder(block=DEPTH_CONFIGS[50][0], layers=DEPTH_CONFIGS[50][1])


def resnet101() -> ResNetEncoder:
    return ResNetEncoder(block=DEPTH_CONFIGS[101][0],
                         layers=DEPTH_CONFIGS[101][1])


def resnet152() -> ResNetEncoder:
    return ResNetEncoder(block=DEPTH_CONFIGS[152][0],
                         layers=DEPTH_CONFIGS[152][1])


def resnext50_32x4d() -> ResNetEncoder:
    """`models/resnet.py:287-297` (dead code in the reference — only 18/50
    are reachable from SingleInputRegressor; kept for constructor parity)."""
    return ResNetEncoder(block=Bottleneck, layers=(3, 4, 6, 3),
                         groups=32, base_width=4)


def resnext101_32x8d() -> ResNetEncoder:
    return ResNetEncoder(block=Bottleneck, layers=(3, 4, 23, 3),
                         groups=32, base_width=8)


def wide_resnet50_2() -> ResNetEncoder:
    return ResNetEncoder(block=Bottleneck, layers=(3, 4, 6, 3),
                         base_width=128)


def wide_resnet101_2() -> ResNetEncoder:
    return ResNetEncoder(block=Bottleneck, layers=(3, 4, 23, 3),
                         base_width=128)


# Pooled feature dims per encoder depth (BasicBlock 512, Bottleneck 2048).
FEATURE_DIMS = {18: 512, 34: 512, 50: 2048, 101: 2048, 152: 2048}
