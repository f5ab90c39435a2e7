"""Model utilities (reference `utils/model_utils.py:3-4` parity)."""

import jax
import numpy as np


def count_parameters(params) -> int:
    """Total trainable parameter count of a flax params pytree."""
    return int(sum(np.prod(x.shape)
                   for x in jax.tree_util.tree_leaves(params)))
