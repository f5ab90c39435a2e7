"""Regressor network: ResNet encoder + IEF head, checkpoint conversion."""

from straps_tpu.models.resnet import (
    ResNetEncoder, resnet18, resnet34, resnet50, resnet101, resnet152,
    resnext50_32x4d, resnext101_32x8d, wide_resnet50_2, wide_resnet101_2,
    FEATURE_DIMS,
)
from straps_tpu.models.ief import (
    IEFModule, make_initial_params_estimate,
    NUM_CAM_PARAMS, NUM_POSE_PARAMS, NUM_SHAPE_PARAMS, NUM_OUTPUT_PARAMS,
)
from straps_tpu.models.regressor import SingleInputRegressor, build_regressor
from straps_tpu.models.convert import (
    torch_state_dict_to_flax, flax_to_torch_state_dict, load_reference_checkpoint,
)

__all__ = [
    "ResNetEncoder", "resnet18", "resnet34", "resnet50", "resnet101",
    "resnet152", "resnext50_32x4d", "resnext101_32x8d", "wide_resnet50_2",
    "wide_resnet101_2", "FEATURE_DIMS",
    "IEFModule", "make_initial_params_estimate",
    "NUM_CAM_PARAMS", "NUM_POSE_PARAMS", "NUM_SHAPE_PARAMS", "NUM_OUTPUT_PARAMS",
    "SingleInputRegressor", "build_regressor",
    "torch_state_dict_to_flax", "flax_to_torch_state_dict",
    "load_reference_checkpoint",
]
