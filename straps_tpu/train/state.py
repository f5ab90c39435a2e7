"""Training state pytree + optimiser construction.

One pytree holds everything the reference checkpoints
(`train/train_synthetic_otf_rendering.py:365-380`): network params + BN
stats, the criterion's learned loss log-variances (load-bearing! they are
optimised jointly, `run_train.py:200-201`), the Adam state over both, and
the bookkeeping scalars (epoch, best epoch, best val metrics).
"""

from typing import Any, Dict

import flax.struct
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    log_vars: Dict[str, jnp.ndarray]
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float) -> optax.GradientTransformation:
    """Adam with torch defaults (betas 0.9/0.999, eps 1e-8) over
    (params, log_vars) jointly — matches `run_train.py:200-201`."""
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)


def create_train_state(params, batch_stats, log_vars,
                       tx: optax.GradientTransformation) -> TrainState:
    opt_state = tx.init((params, log_vars))
    return TrainState(params=params, batch_stats=batch_stats,
                      log_vars=log_vars, opt_state=opt_state,
                      step=jnp.asarray(0, jnp.int32))
