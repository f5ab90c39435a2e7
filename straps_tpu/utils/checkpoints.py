"""Checkpoint save/restore (orbax pytrees).

Checkpoint content parity with the reference save dict
(`train/train_synthetic_otf_rendering.py:365-380`): epoch, best_epoch, best
val metrics, current state (params + BN stats + learned loss log-variances +
optimiser state), best params.  `straps_tpu.models.convert` exports/imports
the reference torch naming for cross-framework compatibility.
"""

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_numpy(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def encode_meta_str(s: str) -> np.ndarray:
    """Strings as uint8 arrays so metadata rides INSIDE the orbax pytree
    (travels with the checkpoint directory, unlike a sidecar file)."""
    return np.frombuffer(s.encode("utf-8"), dtype=np.uint8).copy()


def decode_meta_str(arr) -> str:
    return bytes(np.asarray(arr, np.uint8)).decode("utf-8")


def save_checkpoint(path: str, state, epoch: int, best_epoch: int,
                    best_params, best_epoch_val_metrics: Dict[str, float],
                    heatmap_mode: Optional[str] = None):
    """Save a full training checkpoint to `path` (a directory).

    `heatmap_mode` records which proxy heatmap distribution the model was
    trained on ('clean' | 'legacy', TrainConfig.heatmap_mode) so predict/eval
    can resolve the matching mode automatically — a checkpoint run on the
    other mode's proxies silently degrades (border channels differ by up
    to 1.0)."""
    path = os.path.abspath(path)
    payload = {
        "state": _to_numpy(state),
        "epoch": np.asarray(epoch),
        "best_epoch": np.asarray(best_epoch),
        "best_params": _to_numpy(best_params),
        "best_epoch_val_metrics": {k: np.asarray(v) for k, v in
                                   best_epoch_val_metrics.items()},
    }
    if heatmap_mode is not None:
        payload["meta"] = {"heatmap_mode": encode_meta_str(heatmap_mode)}
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
    has_meta = False
    try:
        meta = ckptr.metadata(path)
        metric_keys = list(meta["best_epoch_val_metrics"].keys())
        has_meta = "meta" in meta
    except Exception:
        full = ckptr.restore(path)
        metric_keys = list(full["best_epoch_val_metrics"].keys())
        has_meta = "meta" in full
    item = {
        "state": _to_numpy(state_template),
        "epoch": np.asarray(0),
        "best_epoch": np.asarray(0),
        "best_params": _to_numpy(state_template.params),
        "best_epoch_val_metrics": {k: np.asarray(0.0) for k in metric_keys},
    }
    if has_meta:
        # Older checkpoints predate the meta subtree; restore it only when
        # present (a template key absent from the checkpoint errors).
        item["meta"] = {"heatmap_mode": np.zeros(0, np.uint8)}
    restored = ckptr.restore(path, item=item)
    return restored
