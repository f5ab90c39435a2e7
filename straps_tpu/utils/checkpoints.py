"""Checkpoint save/restore (orbax pytrees).

Checkpoint content parity with the reference save dict
(`train/train_synthetic_otf_rendering.py:365-380`): epoch, best_epoch, best
val metrics, current state (params + BN stats + learned loss log-variances +
optimiser state), best params.  `straps_tpu.models.convert` exports/imports
the reference torch naming for cross-framework compatibility.
"""

import os
from typing import Any, Dict

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_numpy(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(path: str, state, epoch: int, best_epoch: int,
                    best_params, best_epoch_val_metrics: Dict[str, float]):
    """Save a full training checkpoint to `path` (a directory)."""
    path = os.path.abspath(path)
    payload = {
        "state": _to_numpy(state),
        "epoch": np.asarray(epoch),
        "best_epoch": np.asarray(best_epoch),
        "best_params": _to_numpy(best_params),
        "best_epoch_val_metrics": {k: np.asarray(v) for k, v in
                                   best_epoch_val_metrics.items()},
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)


def restore_checkpoint(path: str, state_template) -> Dict[str, Any]:
    """Restore; `state_template` supplies the pytree structure for `state`
    (orbax restores directly into that structure, preserving the TrainState
    dataclass and the optax opt-state named tuples)."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    # The checkpoint's own metric keys (best_epoch_val_metrics varies with
    # save_val_metrics) come from the cheap METADATA read — a full untyped
    # restore just to learn a handful of dict keys would read every weight
    # tensor from disk twice and hold both trees in host memory.
    try:
        meta = ckptr.metadata(path)
        metric_keys = list(meta["best_epoch_val_metrics"].keys())
    except Exception:
        metric_keys = list(ckptr.restore(path)["best_epoch_val_metrics"]
                           .keys())
    restored = ckptr.restore(path, item={
        "state": _to_numpy(state_template),
        "epoch": np.asarray(0),
        "best_epoch": np.asarray(0),
        "best_params": _to_numpy(state_template.params),
        "best_epoch_val_metrics": {k: np.asarray(0.0) for k in metric_keys},
    })
    return restored
