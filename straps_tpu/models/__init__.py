"""Regressor network: ResNet encoder + IEF head, checkpoint conversion."""

from straps_tpu.models.resnet import ResNetEncoder, resnet18, resnet50, FEATURE_DIMS
from straps_tpu.models.ief import (
    IEFModule, make_initial_params_estimate,
    NUM_CAM_PARAMS, NUM_POSE_PARAMS, NUM_SHAPE_PARAMS, NUM_OUTPUT_PARAMS,
)
from straps_tpu.models.regressor import SingleInputRegressor, build_regressor
from straps_tpu.models.convert import (
    torch_state_dict_to_flax, flax_to_torch_state_dict, load_reference_checkpoint,
)

__all__ = [
    "ResNetEncoder", "resnet18", "resnet50", "FEATURE_DIMS",
    "IEFModule", "make_initial_params_estimate",
    "NUM_CAM_PARAMS", "NUM_POSE_PARAMS", "NUM_SHAPE_PARAMS", "NUM_OUTPUT_PARAMS",
    "SingleInputRegressor", "build_regressor",
    "torch_state_dict_to_flax", "flax_to_torch_state_dict",
    "load_reference_checkpoint",
]
