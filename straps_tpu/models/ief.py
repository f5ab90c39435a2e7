"""Iterative Error Feedback (IEF) regression head.

Same contract as the reference (`models/ief_module.py`): starting from the
mean SMPL parameter estimate (+ weak-perspective camera init [0.9, 0, 0]),
a 3-layer MLP predicts additive refinements for a fixed number of
iterations.  The loop is statically unrolled inside jit — three tiny fused
matmul+add stages on the MXU.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

NUM_CAM_PARAMS = 3
NUM_POSE_PARAMS = 24 * 6
NUM_SHAPE_PARAMS = 10
NUM_OUTPUT_PARAMS = NUM_CAM_PARAMS + NUM_POSE_PARAMS + NUM_SHAPE_PARAMS  # 157


def make_initial_params_estimate(mean_pose_6d: np.ndarray,
                                 mean_shape: np.ndarray) -> np.ndarray:
    """[cam=(0.9, 0, 0), mean 6d pose, mean shape] — mirrors
    `models/ief_module.py:33-46`."""
    init = np.zeros(NUM_OUTPUT_PARAMS, dtype=np.float32)
    init[0] = 0.9
    init[NUM_CAM_PARAMS:NUM_CAM_PARAMS + NUM_POSE_PARAMS] = mean_pose_6d
    init[NUM_CAM_PARAMS + NUM_POSE_PARAMS:] = mean_shape
    return init


class IEFModule(nn.Module):
    """3-FC iterative refinement head.

    Attributes:
      fc_neurons: hidden widths, e.g. (512, 512) for the R18 variant.
      iterations: number of unrolled refinement steps (reference default 3).
      initial_estimate: (157,) static initial parameter vector.
    """
    fc_neurons: Sequence[int]
    iterations: int = 3
    initial_estimate: tuple = ()

    @nn.compact
    def __call__(self, feats: jnp.ndarray):
        B = feats.shape[0]
        init = jnp.asarray(np.asarray(self.initial_estimate, dtype=np.float32))
        params = jnp.broadcast_to(init, (B, NUM_OUTPUT_PARAMS))
        fc1 = nn.Dense(self.fc_neurons[0], name="fc1",
                       bias_init=nn.initializers.zeros)
        fc2 = nn.Dense(self.fc_neurons[1], name="fc2",
                       bias_init=nn.initializers.zeros)
        fc3 = nn.Dense(NUM_OUTPUT_PARAMS, name="fc3",
                       bias_init=nn.initializers.zeros)
        for _ in range(self.iterations):
            state = jnp.concatenate([feats, params], axis=1)
            delta = fc3(nn.relu(fc2(nn.relu(fc1(state)))))
            params = params + delta
        cam = params[:, :NUM_CAM_PARAMS]
        pose = params[:, NUM_CAM_PARAMS:NUM_CAM_PARAMS + NUM_POSE_PARAMS]
        shape = params[:, NUM_CAM_PARAMS + NUM_POSE_PARAMS:]
        return cam, pose, shape
