"""Checkpoint conversion: reference torch state_dicts <-> flax variables.

The reference releases `straps_model_checkpoint.tar` — a torch save dict with
a `best_model_state_dict` whose keys follow the torchvision/reference naming
(`image_encoder.conv1.weight`, `image_encoder.layer1.0.bn2.running_var`,
`ief_module.fc3.bias`, ... — see reference `models/regressor.py` /
`run_predict.py:15-16`).  This module maps those names onto the flax module
tree of `straps_tpu.models.regressor.SingleInputRegressor` so the released
weights run on TPU, and back, so TPU-trained weights can be exported.

Layout conversions: conv OIHW -> HWIO, linear (out,in) -> (in,out).
"""

from typing import Dict, Tuple

import numpy as np


def _split_torch_key(key: str) -> Tuple[str, ...]:
    return tuple(key.split("."))


def torch_state_dict_to_flax(state: Dict[str, np.ndarray]) -> dict:
    """Map a reference regressor state_dict (numpy values) to flax variables.

    Returns {"params": ..., "batch_stats": ...} matching
    `SingleInputRegressor` with name scopes `encoder` / `ief`.
    """
    params: dict = {}
    batch_stats: dict = {}

    def set_in(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for key, value in state.items():
        v = np.asarray(value)
        parts = _split_torch_key(key)
        if parts[0] == "image_encoder":
            # image_encoder.<rest> -> encoder/<module path>
            rest = parts[1:]
            if rest[0].startswith("layer"):
                stage = rest[0]              # e.g. "layer1"
                block = rest[1]              # e.g. "0"
                scope = (f"{stage}_{block}",)
                sub = rest[2:]
                if sub[0] == "downsample":
                    mod = "downsample_conv" if sub[1] == "0" else "downsample_bn"
                    leaf = sub[2]
                else:
                    mod = sub[0]             # conv1 / bn1 / conv2 / ...
                    leaf = sub[1]
            else:
                scope = ()
                mod = rest[0]                # conv1 / bn1
                leaf = rest[1]
            path = ("encoder",) + scope + (mod,)
            if leaf == "weight":
                if v.ndim == 4:              # conv OIHW -> HWIO
                    set_in(params, path + ("kernel",), v.transpose(2, 3, 1, 0))
                else:                        # BN scale
                    set_in(params, path + ("scale",), v)
            elif leaf == "bias":
                set_in(params, path + ("bias",), v)
            elif leaf == "running_mean":
                set_in(batch_stats, path + ("mean",), v)
            elif leaf == "running_var":
                set_in(batch_stats, path + ("var",), v)
            # num_batches_tracked: dropped (not used by flax BatchNorm)
        elif parts[0] == "ief_module":
            if parts[1].startswith("fc"):
                leaf = parts[2]
                path = ("ief", parts[1])
                if leaf == "weight":
                    set_in(params, path + ("kernel",), v.T)
                elif leaf == "bias":
                    set_in(params, path + ("bias",), v)
            # initial_params_estimate buffer (if saved): static, skipped.
    return {"params": params, "batch_stats": batch_stats}


def flax_to_torch_state_dict(variables: dict) -> Dict[str, np.ndarray]:
    """Inverse of `torch_state_dict_to_flax` (reference key naming)."""
    out: Dict[str, np.ndarray] = {}

    def walk(tree, path):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
            else:
                yield_leaf(path + (k,), np.asarray(v))

    def yield_leaf(path, v):
        coll = path[0]
        if path[1] == "encoder":
            mods = path[2:-1]
            leaf = path[-1]
            if len(mods) == 1:
                torch_mod = f"image_encoder.{mods[0]}"
            else:
                stage, block = mods[0].rsplit("_", 1)
                inner = mods[1]
                if inner == "downsample_conv":
                    inner = "downsample.0"
                elif inner == "downsample_bn":
                    inner = "downsample.1"
                torch_mod = f"image_encoder.{stage}.{block}.{inner}"
            if coll == "params":
                if leaf == "kernel":
                    out[f"{torch_mod}.weight"] = v.transpose(3, 2, 0, 1)
                elif leaf == "scale":
                    out[f"{torch_mod}.weight"] = v
                elif leaf == "bias":
                    out[f"{torch_mod}.bias"] = v
            else:  # batch_stats
                if leaf == "mean":
                    out[f"{torch_mod}.running_mean"] = v
                elif leaf == "var":
                    out[f"{torch_mod}.running_var"] = v
        elif path[1] == "ief":
            fc = path[2]
            leaf = path[-1]
            if leaf == "kernel":
                out[f"ief_module.{fc}.weight"] = v.T
            elif leaf == "bias":
                out[f"ief_module.{fc}.bias"] = v

    for coll in ("params", "batch_stats"):
        if coll in variables:
            walk(variables[coll], (coll,))
    return out


def load_reference_checkpoint(path: str, key: str = "best_model_state_dict") -> dict:
    """Load a reference `.tar` checkpoint and convert to flax variables.

    Mirrors `run_predict.py:15-16` (loads `best_model_state_dict`).
    """
    import torch  # local import: torch is a conversion-only dependency

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt[key] if key in ckpt else ckpt
    np_state = {k: v.detach().cpu().numpy() for k, v in state.items()
                if hasattr(v, "detach")}
    return torch_state_dict_to_flax(np_state)
