"""detectron2 checkpoint conversion for the perception models.

Maps detectron2 `.pkl` weight names (the reference's
`pointrend_rcnn_R_50_fpn.pkl` / keypoint-RCNN zoo weights /
`densepose_rcnn_R_101_fpn_s1x.pkl`, `predict/predict_3D.py:44-64`) onto the
flax module tree of `straps_tpu.perception.rcnn`.  Conversions: conv OIHW ->
HWIO, linear (out, in) -> (in, out); detectron2 FrozenBN (weight/bias/
running_mean/running_var) -> flax BatchNorm params + batch_stats (inference
mode).
"""

import pickle
from typing import Dict, Tuple

import numpy as np

# detectron2 ResNet block name -> our flax scope pieces.
_SHORTCUT = {"shortcut": ("downsample_conv", "downsample_bn")}

# torch ConvTranspose2d weights are (in, out, kh, kw) and flax ConvTranspose
# applies the kernel un-flipped -> needs transpose(2, 3, 0, 1) + spatial flip
# (verified numerically against torch F.conv_transpose2d, k4/s2/p1 == SAME).
_DECONV_NAMES = {"score_lowres", "ann_index_lowres", "index_uv_lowres",
                 "u_lowres", "v_lowres"}
# FCs applied to torch-flattened (C, H, W) conv features: our NHWC flatten is
# (H, W, C), so the input dimension must be permuted CHW -> HWC.  Values are
# the spatial side of the flattened map (channel count is inferred).
_FLATTEN_FC_SIDE = {("trunk", "box_head", "fc1"): 7,
                    ("coarse_head", "coarse_mask_fc1"): 7}
# PointRend's point head runs 1x1 conv1d layers (out, in, 1) == Dense.
_CONV1D_SCOPES = {"point_head"}


def _set_in(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_weight(path, v, params, batch_stats, is_bn: bool, leaf: str):
    if is_bn:
        if leaf == "weight":
            _set_in(params, path + ("scale",), v)
        elif leaf == "bias":
            _set_in(params, path + ("bias",), v)
        elif leaf == "running_mean":
            _set_in(batch_stats, path + ("mean",), v)
        elif leaf == "running_var":
            _set_in(batch_stats, path + ("var",), v)
        return
    if leaf == "bias":
        _set_in(params, path + ("bias",), v)
        return
    if leaf != "weight":
        return
    if path[-1] in _DECONV_NAMES and v.ndim == 4:
        # (in, out, kh, kw) -> (kh, kw, in, out), spatially flipped.
        _set_in(params, path + ("kernel",),
                np.ascontiguousarray(v.transpose(2, 3, 0, 1)[::-1, ::-1]))
    elif v.ndim == 4:
        _set_in(params, path + ("kernel",), v.transpose(2, 3, 1, 0))
    elif v.ndim == 3 and path[0] in _CONV1D_SCOPES:
        # conv1d (out, in, 1) == linear.
        _set_in(params, path + ("kernel",), v[:, :, 0].T)
    elif v.ndim == 2:
        side = _FLATTEN_FC_SIDE.get(path[-3:] if len(path) >= 3 else path)
        if side is None:
            side = _FLATTEN_FC_SIDE.get(path[-2:])
        if side is not None:
            out_dim, in_flat = v.shape
            C = in_flat // (side * side)
            w = v.reshape(out_dim, C, side, side).transpose(0, 2, 3, 1)
            _set_in(params, path + ("kernel",),
                    w.reshape(out_dim, in_flat).T)
        else:
            _set_in(params, path + ("kernel",), v.T)
    else:
        _set_in(params, path + ("scale",), v)


def _map_backbone(rest, trunk_scope):
    """'backbone.<module path, no leaf>' -> (flax path, is_bn) or None."""
    if rest[0] == "bottom_up":
        sub = rest[1:]
        if sub[0] == "stem":
            # stem.conv1 -> conv1; stem.conv1.norm -> bn1
            if len(sub) > 2 and sub[2] == "norm":
                return trunk_scope + ("backbone", "bottom_up", "bn1"), True
            return trunk_scope + ("backbone", "bottom_up", "conv1"), False
        if sub[0].startswith("res"):
            stage = int(sub[0][3:]) - 1   # res2 -> layer1
            block = sub[1]
            inner = sub[2]
            path = trunk_scope + ("backbone", "bottom_up",
                                  f"layer{stage}_{block}")
            if inner == "shortcut":
                if len(sub) > 3 and sub[3] == "norm":
                    return path + ("downsample_bn",), True
                return path + ("downsample_conv",), False
            # convN / convN.norm
            if len(sub) > 3 and sub[3] == "norm":
                return path + (f"bn{inner[-1]}",), True
            return path + (inner,), False
    if rest[0].startswith("fpn_lateral"):
        i = rest[0][-1]
        return trunk_scope + ("backbone", "fpn", f"lateral{i}"), False
    if rest[0].startswith("fpn_output"):
        i = rest[0][-1]
        return trunk_scope + ("backbone", "fpn", f"output{i}"), False
    return None


def _map_densepose_head(sub):
    """'roi_heads.densepose_head.<module path, no leaf>' -> flax path.

    V1ConvX: flat `body_conv_fcn{i}` convs.  DeepLab
    (`densepose_head.py:24-268`): `ASPP.convs.{0..4}.*` (conv1x1 / three
    atrous / pooling branches, each Sequential(conv, GN[, pool]) ),
    `ASPP.project.0`, optional `NLBlock.{theta,phi.0,g.0,W.0,W.1}`, and
    `body_conv_fcn{i}[.norm]` stacked convs."""
    head = ("densepose_head",)
    if sub[0] == "ASPP":
        if sub[1] == "convs":
            i, j = int(sub[2]), sub[3]
            if i == 0:
                return head + ("aspp", "conv1x1" if j == "0" else "gn1x1")
            if i in (1, 2, 3):
                return head + ("aspp", f"atrous{i}" if j == "0"
                               else f"gn_atrous{i}")
            # i == 4: pooling branch — Sequential(AdaptiveAvgPool, conv, GN)
            return head + ("aspp", "pool_conv" if j == "1" else "gn_pool")
        if sub[1] == "project":
            return head + ("aspp", "project")        # index 0 conv only
        return None
    if sub[0] == "NLBlock":
        m = sub[1]
        if m == "theta":
            return head + ("nonlocal", "theta")
        if m in ("phi", "g"):                        # Sequential(conv, pool)
            return head + ("nonlocal", m)
        if m == "W":                                 # Sequential(conv, GN)
            return head + ("nonlocal", "W" if sub[2] == "0" else "gn_w")
        return None
    if sub[0].startswith("body_conv_fcn"):
        if len(sub) > 1 and sub[1] == "norm":
            return head + ("gn" + sub[0][len("body_conv_fcn"):],)
        return head + (sub[0],)
    return head + (sub[0],)


def convert_d2_state(d2_state: Dict[str, np.ndarray]) -> dict:
    """Convert a flat detectron2 state dict to flax variables for
    KeypointRCNN / PointRendRCNN / DensePoseRCNN.  The mapping is purely
    name-driven — one table covers all three architectures' heads, so no
    architecture selector is needed."""
    params: dict = {}
    batch_stats: dict = {}
    trunk = ("trunk",)

    for key, value in d2_state.items():
        v = np.asarray(value)
        parts = key.split(".")
        leaf = parts[-1]
        body = parts[:-1]
        path = None
        is_bn = False
        if body and body[0] == "backbone":
            mapped = _map_backbone(tuple(body[1:]), trunk)
            if mapped is not None:
                path, is_bn = mapped
        elif body[:2] == ["proposal_generator", "rpn_head"]:
            name = {"conv": "conv", "objectness_logits": "objectness",
                    "anchor_deltas": "anchor_deltas"}.get(body[2])
            if name:
                path = trunk + ("rpn_head", name)
        elif body[:2] == ["roi_heads", "box_head"]:
            path = trunk + ("box_head", body[2])          # fc1 / fc2
        elif body[:2] == ["roi_heads", "box_predictor"]:
            path = trunk + ("box_head", body[2])          # cls_score / bbox_pred
        elif body[:2] == ["roi_heads", "keypoint_head"]:
            path = ("keypoint_head", body[2])
        elif body[:2] == ["roi_heads", "mask_coarse_head"]:
            path = ("coarse_head", body[2])
        elif body[:2] == ["roi_heads", "mask_point_head"]:
            name = body[2]
            if name.startswith("fc"):
                path = ("point_head", name)
            elif name == "predictor":
                path = ("point_head", "predictor")
        elif body[:2] == ["roi_heads", "densepose_head"]:
            path = _map_densepose_head(body[2:])
        elif body[:2] == ["roi_heads", "densepose_predictor"]:
            path = ("densepose_predictor", body[2])
        if path is not None:
            _convert_weight(path, v, params, batch_stats, is_bn, leaf)
    return {"params": params, "batch_stats": batch_stats}


def load_d2_pkl(path: str) -> dict:
    """Load a detectron2 pkl checkpoint ({'model': {name: array}}) and
    convert to flax variables."""
    with open(path, "rb") as f:
        ckpt = pickle.load(f, encoding="latin1")
    state = ckpt.get("model", ckpt)
    state = {k: np.asarray(v) for k, v in state.items()
             if isinstance(v, np.ndarray) or hasattr(v, "shape")}
    return convert_d2_state(state)
