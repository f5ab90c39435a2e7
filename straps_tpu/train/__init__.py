"""Training: state, fused synthetic data generation, jitted steps, loop."""

from straps_tpu.train.state import TrainState, create_train_state, make_optimizer
from straps_tpu.train.synthetic import (
    SyntheticBatch, generate_synthetic_batch, select_joint_sets, build_proxy,
)
from straps_tpu.train.step import make_train_step, make_val_step
from straps_tpu.train.loop import train, build_training

__all__ = [
    "TrainState", "create_train_state", "make_optimizer",
    "SyntheticBatch", "generate_synthetic_batch", "select_joint_sets",
    "build_proxy", "make_train_step", "make_val_step", "train",
    "build_training",
]
