"""Generative torch twin of the detectron2 perception stack — TEST ORACLE.

Independent torch implementation of the detectron2 inference semantics the
reference's predictors rely on (`predict/predict_3D.py:35-64`): MSRA-style
ResNet-FPN (FrozenBN, stride-in-1x1), StandardRPNHead + per-level NMS
proposal selection, StandardROIHeads box inference, keypoint head, and the
PointRend coarse/point/subdivision path (`PointRend/point_rend/*`).

Modules are keyed by the exact detectron2 state-dict names, so
`state_dict()` of a random-init twin is a faithful stand-in for a zoo
checkpoint: exporting it through `straps_tpu.perception.convert_d2` and
asserting forward agreement with the flax models proves the converter and
the flax architectures numerically (the same torch-twin trick the regressor
uses in test_torch_parity.py).
"""

import math

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn


# torchvision is not in this environment: greedy NMS and ROIAlignV2 are
# implemented here directly from their specifications (independent of the
# JAX implementations under test).

def nms(boxes, scores, iou_threshold):
    """Greedy NMS; returns kept indices in descending score order."""
    order = torch.argsort(scores, descending=True)
    b = boxes[order]
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    areas = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
    keep = []
    alive = torch.ones(len(b), dtype=torch.bool)
    for i in range(len(b)):
        if not alive[i]:
            continue
        keep.append(order[i])
        xx1 = torch.maximum(x1[i], x1[i + 1:])
        yy1 = torch.maximum(y1[i], y1[i + 1:])
        xx2 = torch.minimum(x2[i], x2[i + 1:])
        yy2 = torch.minimum(y2[i], y2[i + 1:])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[i] + areas[i + 1:] - inter).clamp(min=1e-9)
        alive[i + 1:] &= iou <= iou_threshold
    return torch.stack(keep) if keep else torch.zeros(0, dtype=torch.int64)


def batched_nms(boxes, scores, idxs, iou_threshold):
    """Category-batched NMS via the coordinate-offset trick (the
    torchvision implementation strategy)."""
    if len(boxes) == 0:
        return torch.zeros(0, dtype=torch.int64)
    offset = idxs.to(boxes.dtype) * (boxes.max() + 1.0)
    return nms(boxes + offset[:, None], scores, iou_threshold)


def tv_roi_align(feat, rois, output_size, spatial_scale, sampling_ratio,
                 aligned=True):
    """ROIAlign on a (1, C, H, W) feature map; rois: (R, 5)
    [batch, x1, y1, x2, y2].  aligned=True is ROIAlignV2 (half-pixel
    shift); aligned=False the legacy pooler type DensePose configures.

    Implements torchvision's EXACT `bilinear_interpolate` semantics (an
    earlier grid_sample-based version mirror-deviated together with the
    JAX side): samples more than 1px outside the map are zero; samples in
    the 1px border band CLAMP to the edge pixel (grid_sample zero-padding
    instead blends toward zero across the band); legacy (aligned=False)
    additionally clamps the roi extent to >= 1px (`max(roi_width, 1.)`
    backward compatibility — absent in the aligned path)."""
    assert feat.shape[0] == 1
    C, H, W = feat.shape[1:]
    R = rois.shape[0]
    out = torch.zeros(R, C, output_size, output_size)
    shift = 0.5 if aligned else 0.0
    f = feat[0]
    for r in range(R):
        x1, y1, x2, y2 = (rois[r, 1:] * spatial_scale - shift)
        rw_raw, rh_raw = x2 - x1, y2 - y1
        if aligned:
            rw, rh = rw_raw.clamp(min=1e-6), rh_raw.clamp(min=1e-6)
        else:
            rw, rh = rw_raw.clamp(min=1.0), rh_raw.clamp(min=1.0)
        if sampling_ratio > 0:
            sw = sh = sampling_ratio
        else:
            # Adaptive (POOLER_SAMPLING_RATIO=0): ceil(roi / out) samples
            # per bin per axis, from the clamped roi for the legacy pooler
            # and the RAW roi when aligned (degenerate -> 0 samples ->
            # zero output, torchvision's `count = max(gh*gw, 1)` divide).
            sw = int(torch.ceil((rw if not aligned else rw_raw)
                                / output_size).clamp(min=0))
            sh = int(torch.ceil((rh if not aligned else rh_raw)
                                / output_size).clamp(min=0))
            if sw == 0 or sh == 0:
                continue
        grid_x = (torch.arange(output_size * sw,
                               dtype=torch.float32) + 0.5) / sw
        grid_y = (torch.arange(output_size * sh,
                               dtype=torch.float32) + 0.5) / sh
        xs = x1 + (rw / output_size) * grid_x
        ys = y1 + (rh / output_size) * grid_y
        valid_x = (xs >= -1.0) & (xs <= W)
        valid_y = (ys >= -1.0) & (ys <= H)
        xc = xs.clamp(0.0, W - 1.0)
        yc = ys.clamp(0.0, H - 1.0)
        x0 = xc.floor().long()
        y0 = yc.floor().long()
        x1i = (x0 + 1).clamp(max=W - 1)
        y1i = (y0 + 1).clamp(max=H - 1)
        fx = (xc - x0)[None, None, :]
        fy = (yc - y0)[None, :, None]
        v = (f[:, y0][:, :, x0] * (1 - fy) * (1 - fx)
             + f[:, y0][:, :, x1i] * (1 - fy) * fx
             + f[:, y1i][:, :, x0] * fy * (1 - fx)
             + f[:, y1i][:, :, x1i] * fy * fx)
        v = v * (valid_y[None, :, None] & valid_x[None, None, :])
        v = v.view(C, output_size, sh, output_size, sw)
        out[r] = v.mean(dim=(2, 4))
    return out


# ---------------------------------------------------------------- layers --

class Conv2dNorm(nn.Conv2d):
    """detectron2 layers.Conv2d: plain conv with an attached `.norm`."""

    def __init__(self, *args, norm=None, activation=None, **kw):
        super().__init__(*args, **kw)
        self.norm = norm
        self.activation = activation

    def forward(self, x):
        x = super().forward(x)
        if self.norm is not None:
            x = self.norm(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


def frozen_bn(c):
    bn = nn.BatchNorm2d(c, eps=1e-5)
    bn.eval()
    return bn


class BottleneckBlock(nn.Module):
    def __init__(self, cin, planes, cout, stride, stride_in_1x1=True):
        super().__init__()
        s1, s2 = (stride, 1) if stride_in_1x1 else (1, stride)
        self.conv1 = Conv2dNorm(cin, planes, 1, s1, bias=False,
                                norm=frozen_bn(planes))
        self.conv2 = Conv2dNorm(planes, planes, 3, s2, 1, bias=False,
                                norm=frozen_bn(planes))
        self.conv3 = Conv2dNorm(planes, cout, 1, bias=False,
                                norm=frozen_bn(cout))
        if cin != cout or stride != 1:
            self.shortcut = Conv2dNorm(cin, cout, 1, stride, bias=False,
                                       norm=frozen_bn(cout))
        else:
            self.shortcut = None

    def forward(self, x):
        idt = x if self.shortcut is None else self.shortcut(x)
        out = F.relu(self.conv1(x))
        out = F.relu(self.conv2(out))
        out = self.conv3(out)
        return F.relu(out + idt)


class Stem(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = Conv2dNorm(3, 64, 7, 2, 3, bias=False,
                                norm=frozen_bn(64))

    def forward(self, x):
        x = F.relu(self.conv1(x))
        return F.max_pool2d(x, 3, 2, 1)


class BottomUp(nn.Module):
    """ResNet stages res2..res5 with d2 naming."""

    def __init__(self, depth=50):
        super().__init__()
        self.stem = Stem()
        blocks_per_stage = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
        cin, planes = 64, 64
        for s, n in enumerate(blocks_per_stage):
            stage = []
            for b in range(n):
                stride = 1 if (s == 0 or b > 0) else 2
                stage.append(BottleneckBlock(cin, planes, planes * 4, stride))
                cin = planes * 4
            setattr(self, f"res{s + 2}", nn.Sequential(*stage))
            planes *= 2

    def forward(self, x):
        x = self.stem(x)
        feats = {}
        for s in range(2, 6):
            x = getattr(self, f"res{s}")(x)
            feats[f"res{s}"] = x
        return feats


class Backbone(nn.Module):
    """FPN over the bottom-up stages (d2 naming: fpn_lateral*/fpn_output*)."""

    def __init__(self, depth=50, out_channels=256):
        super().__init__()
        self.bottom_up = BottomUp(depth)
        dims = {"res2": 256, "res3": 512, "res4": 1024, "res5": 2048}
        for i, n in enumerate(["res2", "res3", "res4", "res5"]):
            setattr(self, f"fpn_lateral{i + 2}",
                    nn.Conv2d(dims[n], out_channels, 1))
            setattr(self, f"fpn_output{i + 2}",
                    nn.Conv2d(out_channels, out_channels, 3, padding=1))

    def forward(self, x):
        stages = self.bottom_up(x)
        laterals = [getattr(self, f"fpn_lateral{i + 2}")(stages[f"res{i + 2}"])
                    for i in range(4)]
        merged = [None] * 4
        merged[3] = laterals[3]
        for i in (2, 1, 0):
            up = F.interpolate(merged[i + 1], scale_factor=2, mode="nearest")
            merged[i] = laterals[i] + up
        outs = [getattr(self, f"fpn_output{i + 2}")(m)
                for i, m in enumerate(merged)]
        outs.append(F.max_pool2d(outs[3], kernel_size=1, stride=2))
        return outs  # [p2..p6]


class RPNHead(nn.Module):
    def __init__(self, channels=256, num_anchors=3):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, padding=1)
        self.objectness_logits = nn.Conv2d(channels, num_anchors, 1)
        self.anchor_deltas = nn.Conv2d(channels, num_anchors * 4, 1)

    def forward(self, feats):
        logits, deltas = [], []
        for f in feats:
            t = F.relu(self.conv(f))
            logits.append(self.objectness_logits(t))
            deltas.append(self.anchor_deltas(t))
        return logits, deltas


class BoxHead(nn.Module):
    def __init__(self, in_dim=256 * 7 * 7, fc_dim=1024):
        super().__init__()
        self.fc1 = nn.Linear(in_dim, fc_dim)
        self.fc2 = nn.Linear(fc_dim, fc_dim)

    def forward(self, x):
        x = torch.flatten(x, start_dim=1)
        x = F.relu(self.fc1(x))
        return F.relu(self.fc2(x))


class BoxPredictor(nn.Module):
    def __init__(self, fc_dim=1024, num_classes=1):
        super().__init__()
        self.cls_score = nn.Linear(fc_dim, num_classes + 1)
        self.bbox_pred = nn.Linear(fc_dim, num_classes * 4)


class KeypointHead(nn.Module):
    def __init__(self, channels=256, conv_dim=512, num_kp=17, num_convs=8):
        super().__init__()
        cin = channels
        for i in range(num_convs):
            setattr(self, f"conv_fcn{i + 1}", nn.Conv2d(cin, conv_dim, 3,
                                                        padding=1))
            cin = conv_dim
        self.num_convs = num_convs
        self.score_lowres = nn.ConvTranspose2d(conv_dim, num_kp, 4, 2, 1)

    def forward(self, x):
        for i in range(self.num_convs):
            x = F.relu(getattr(self, f"conv_fcn{i + 1}")(x))
        x = self.score_lowres(x)
        return F.interpolate(x, scale_factor=2, mode="bilinear",
                             align_corners=False)


class CoarseMaskHead(nn.Module):
    """PointRend/point_rend/coarse_mask_head.py for 256-ch input (no
    channel-reduce conv)."""

    def __init__(self, conv_dim=256, fc_dim=1024, num_classes=80, side=7):
        super().__init__()
        self.num_classes, self.side = num_classes, side
        self.reduce_spatial_dim_conv = nn.Conv2d(conv_dim, conv_dim, 2, 2, 0)
        self.coarse_mask_fc1 = nn.Linear(conv_dim * 7 * 7, fc_dim)
        self.coarse_mask_fc2 = nn.Linear(fc_dim, fc_dim)
        self.prediction = nn.Linear(fc_dim, num_classes * side * side)

    def forward(self, x):
        # x: (R, C, 14, 14)
        N = x.shape[0]
        x = F.relu(self.reduce_spatial_dim_conv(x))
        x = torch.flatten(x, start_dim=1)
        x = F.relu(self.coarse_mask_fc1(x))
        x = F.relu(self.coarse_mask_fc2(x))
        return self.prediction(x).view(N, self.num_classes, self.side,
                                       self.side)


class PointHead(nn.Module):
    """StandardPointHead: conv1d MLP with coarse re-concat each layer."""

    def __init__(self, fine_dim=256, num_classes=80, fc_dim=256, num_fc=3):
        super().__init__()
        cin = fine_dim + num_classes
        for i in range(num_fc):
            setattr(self, f"fc{i + 1}", nn.Conv1d(cin, fc_dim, 1))
            cin = fc_dim + num_classes
        self.num_fc = num_fc
        self.predictor = nn.Conv1d(cin, num_classes, 1)

    def forward(self, fine, coarse):
        # fine: (R, Cf, P); coarse: (R, K, P)
        x = torch.cat([fine, coarse], dim=1)
        for i in range(self.num_fc):
            x = F.relu(getattr(self, f"fc{i + 1}")(x))
            x = torch.cat([x, coarse], dim=1)
        return self.predictor(x)


# ------------------------------------------------------------- inference --

def d2_cell_anchors(size, aspect_ratios=(0.5, 1.0, 2.0)):
    out = []
    area = size * size
    for ar in aspect_ratios:
        w = math.sqrt(area / ar)
        h = ar * w
        out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return torch.tensor(out, dtype=torch.float32)


def d2_anchors(img_size, strides=(4, 8, 16, 32, 64),
               sizes=(32, 64, 128, 256, 512), feat_sizes=None):
    """DefaultAnchorGenerator with offset 0 on a square image.  Real d2
    sizes grids from the feature maps; pass feat_sizes where ceil-of-SAME
    convs diverges from floor division (P6 at 800² is 13, not 12)."""
    all_levels = []
    for i, (stride, size) in enumerate(zip(strides, sizes)):
        if feat_sizes is not None:
            fh, fw = feat_sizes[i]
        else:
            fh = fw = img_size // stride
        base = d2_cell_anchors(size)
        sx = torch.arange(fw, dtype=torch.float32) * stride
        sy = torch.arange(fh, dtype=torch.float32) * stride
        gy, gx = torch.meshgrid(sy, sx, indexing="ij")
        shifts = torch.stack([gx.reshape(-1), gy.reshape(-1),
                              gx.reshape(-1), gy.reshape(-1)], dim=1)
        all_levels.append((shifts[:, None, :] + base[None]).reshape(-1, 4))
    return all_levels


def d2_apply_deltas(deltas, boxes, weights=(1.0, 1.0, 1.0, 1.0),
                    scale_clamp=math.log(1000.0 / 16)):
    """Box2BoxTransform.apply_deltas."""
    widths = boxes[:, 2] - boxes[:, 0]
    heights = boxes[:, 3] - boxes[:, 1]
    ctr_x = boxes[:, 0] + 0.5 * widths
    ctr_y = boxes[:, 1] + 0.5 * heights
    wx, wy, ww, wh = weights
    dx = deltas[:, 0::4] / wx
    dy = deltas[:, 1::4] / wy
    dw = torch.clamp(deltas[:, 2::4] / ww, max=scale_clamp)
    dh = torch.clamp(deltas[:, 3::4] / wh, max=scale_clamp)
    pred_ctr_x = dx * widths[:, None] + ctr_x[:, None]
    pred_ctr_y = dy * heights[:, None] + ctr_y[:, None]
    pred_w = torch.exp(dw) * widths[:, None]
    pred_h = torch.exp(dh) * heights[:, None]
    out = torch.zeros_like(deltas)
    out[:, 0::4] = pred_ctr_x - 0.5 * pred_w
    out[:, 1::4] = pred_ctr_y - 0.5 * pred_h
    out[:, 2::4] = pred_ctr_x + 0.5 * pred_w
    out[:, 3::4] = pred_ctr_y + 0.5 * pred_h
    return out


def d2_proposals(logits, deltas, img_size, pre_nms_topk=1000,
                 post_nms_topk=1000, nms_thresh=0.7):
    """find_top_rpn_proposals: per-level topk -> decode -> clip ->
    level-batched NMS -> global topk by score.  Anchor grids sized from
    the logits' own spatial dims (real d2 derives them from the features)."""
    anchors = d2_anchors(img_size,
                         feat_sizes=[(lg.shape[2], lg.shape[3])
                                     for lg in logits])
    boxes_all, scores_all, levels_all = [], [], []
    for lvl, (lg, dl, anch) in enumerate(zip(logits, deltas, anchors)):
        A = lg.shape[1]
        scores = lg[0].permute(1, 2, 0).reshape(-1)
        d = dl[0].view(A, 4, lg.shape[2], lg.shape[3]) \
            .permute(2, 3, 0, 1).reshape(-1, 4)
        k = min(pre_nms_topk, scores.numel())
        top_scores, idx = scores.topk(k)
        b = d2_apply_deltas(d[idx], anch[idx])
        b[:, 0::2].clamp_(0, img_size)
        b[:, 1::2].clamp_(0, img_size)
        boxes_all.append(b)
        scores_all.append(top_scores)
        levels_all.append(torch.full((k,), lvl, dtype=torch.int64))
    boxes = torch.cat(boxes_all)
    scores = torch.cat(scores_all)
    levels = torch.cat(levels_all)
    valid = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
    boxes, scores, levels = boxes[valid], scores[valid], levels[valid]
    keep = batched_nms(boxes, scores, levels, nms_thresh)[:post_nms_topk]
    return boxes[keep], scores[keep]


def d2_multilevel_roi_align(feats, boxes, strides, output_size,
                            sampling_ratio=2, canonical_level=4,
                            canonical_size=224.0, aligned=True):
    """ROIPooler with ROIAlign(V2) + assign_boxes_to_levels."""
    area = (boxes[:, 2] - boxes[:, 0]).clamp(min=0) * \
        (boxes[:, 3] - boxes[:, 1]).clamp(min=0)
    lvl = torch.floor(canonical_level +
                      torch.log2(torch.sqrt(area.clamp(min=1e-9)) /
                                 canonical_size + 1e-9))
    min_l = int(math.log2(strides[0]))
    max_l = min_l + len(feats) - 1
    lvl = lvl.clamp(min_l, max_l).to(torch.int64)
    R = boxes.shape[0]
    C = feats[0].shape[1]
    out = torch.zeros(R, C, output_size, output_size)
    rois = torch.cat([torch.zeros(R, 1), boxes], dim=1)
    for i, (f, s) in enumerate(zip(feats, strides)):
        pooled = tv_roi_align(f, rois, output_size, spatial_scale=1.0 / s,
                              sampling_ratio=sampling_ratio, aligned=aligned)
        m = (lvl == (min_l + i)).view(R, 1, 1, 1).float()
        out = out + pooled * m
    return out


def d2_box_inference(scores, deltas, proposals, img_size, score_thresh=0.05,
                     nms_thresh=0.5, topk=100):
    """fast_rcnn_inference for the person class (class 0)."""
    probs = F.softmax(scores, dim=-1)[:, 0]
    boxes = d2_apply_deltas(deltas[:, :4], proposals,
                            weights=(10.0, 10.0, 5.0, 5.0))
    boxes[:, 0::2].clamp_(0, img_size)
    boxes[:, 1::2].clamp_(0, img_size)
    keep_mask = probs > score_thresh
    idx = torch.nonzero(keep_mask).flatten()
    keep = nms(boxes[idx], probs[idx], nms_thresh)[:topk]
    sel = idx[keep]
    return boxes[sel], probs[sel]


def point_sample(feat, points01, align_corners=False):
    """PointRend point_sample: grid_sample at [0,1]^2 points.

    feat: (N, C, H, W); points01: (N, P, 2) -> (N, C, P)."""
    grid = 2.0 * points01 - 1.0
    out = F.grid_sample(feat, grid.unsqueeze(2), align_corners=align_corners)
    return out[..., 0]


def regular_grid_points(R, side):
    """generate_regular_grid_point_coords: bin-centre grid in [0,1]^2,
    row-major (y outer), last dim (x, y)."""
    c = (torch.arange(side, dtype=torch.float32) + 0.5) / side
    gy, gx = torch.meshgrid(c, c, indexing="ij")
    pts = torch.stack([gx.reshape(-1), gy.reshape(-1)], dim=-1)
    return pts[None].expand(R, -1, -1)


def sample_fine_and_coarse(p2, coarse_logits, boxes, points01, stride=4.0):
    """point_sample_fine_grained_features (IN_FEATURES=['p2']) + coarse
    point sampling."""
    R, P = points01.shape[:2]
    x_img = boxes[:, 0:1] + points01[..., 0] * (boxes[:, 2:3] - boxes[:, 0:1])
    y_img = boxes[:, 1:2] + points01[..., 1] * (boxes[:, 3:4] - boxes[:, 1:2])
    H, W = p2.shape[-2:]
    pts_feat = torch.stack([x_img / (stride * W), y_img / (stride * H)],
                           dim=-1)
    fine = point_sample(p2.expand(R, -1, -1, -1), pts_feat)
    coarse = point_sample(coarse_logits, points01)
    return fine, coarse


def d2_subdivision(point_head, coarse_logits, p2, boxes, steps=5,
                   num_points=28 * 28):
    """PointRendROIHeads._forward_mask_point inference loop
    (`roi_heads.py:193-218`), person class for uncertainty."""
    mask = coarse_logits.clone()
    R = mask.shape[0]
    for _ in range(steps):
        mask = F.interpolate(mask, scale_factor=2, mode="bilinear",
                             align_corners=False)
        H, W = mask.shape[-2:]
        unc = -(mask[:, 0].abs()).reshape(R, H * W)
        k = min(num_points, H * W)
        idx = unc.topk(k, dim=1).indices
        px = (idx % W).float()
        py = (idx // W).float()
        pts01 = torch.stack([(px + 0.5) / W, (py + 0.5) / H], dim=-1)
        fine, coarse_pt = sample_fine_and_coarse(p2, coarse_logits, boxes,
                                                 pts01)
        logits = point_head(fine, coarse_pt)        # (R, K, P)
        C = mask.shape[1]
        scatter_idx = idx.unsqueeze(1).expand(-1, C, -1)
        mask = mask.reshape(R, C, H * W).scatter(2, scatter_idx, logits) \
            .view(R, C, H, W)
    return mask


def d2_paste_mask(mask_logits, box, img_size, threshold=0.5):
    """paste_masks_in_image for one (S, S) person mask."""
    probs = torch.sigmoid(mask_logits)[None, None]
    ys = torch.arange(img_size, dtype=torch.float32) + 0.5
    xs = torch.arange(img_size, dtype=torch.float32) + 0.5
    u = (xs[None, :] - box[0]) / (box[2] - box[0]).clamp(min=1e-6)
    v = (ys[:, None] - box[1]) / (box[3] - box[1]).clamp(min=1e-6)
    gx = (2.0 * u - 1.0).expand(img_size, img_size)
    gy = (2.0 * v - 1.0).expand(img_size, img_size)
    grid = torch.stack([gx, gy], dim=-1)[None]
    vals = F.grid_sample(probs, grid, align_corners=False)[0, 0]
    inside = (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
    return ((vals * inside) > threshold).float()


def d2_heatmaps_to_keypoints(maps, rois):
    """detectron2 `heatmaps_to_keypoints` (consumed by the reference via
    `predict/predict_joints2D.py:33-60`), implemented from its spec: resize
    each (K, S, S) heatmap to the integer ROI size with bicubic
    interpolation (align_corners=False), argmax on that grid, map back via
    (idx + 0.5) * side / ceil(side).  Returns (R, K, 3): x, y, peak value."""
    n, K = maps.shape[0], maps.shape[1]
    out = torch.zeros(n, K, 3)
    widths = (rois[:, 2] - rois[:, 0]).clamp(min=1)
    heights = (rois[:, 3] - rois[:, 1]).clamp(min=1)
    for i in range(n):
        wc = int(widths[i].ceil())
        hc = int(heights[i].ceil())
        roi_map = F.interpolate(maps[[i]], size=(hc, wc), mode="bicubic",
                                align_corners=False)[0]      # (K, hc, wc)
        pos = roi_map.view(K, -1).argmax(1)
        x_int = pos % wc
        y_int = pos // wc
        out[i, :, 0] = rois[i, 0] + (x_int.float() + 0.5) * widths[i] / wc
        out[i, :, 1] = rois[i, 1] + (y_int.float() + 0.5) * heights[i] / hc
        out[i, :, 2] = roi_map[torch.arange(K), y_int, x_int]
    return out


# ----------------------------------------------------------------- twins --

class D2KeypointRCNNTwin(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = Backbone(50)
        self.proposal_generator = nn.Module()
        self.proposal_generator.rpn_head = RPNHead()
        self.roi_heads = nn.Module()
        self.roi_heads.box_head = BoxHead()
        self.roi_heads.box_predictor = BoxPredictor(num_classes=1)
        self.roi_heads.keypoint_head = KeypointHead()

    def forward(self, image, post_nms_topk=1000, max_detections=100):
        """image: (H, W, 3) normalised BGR numpy-style array (torch)."""
        x = image.permute(2, 0, 1)[None]
        img_size = image.shape[0]
        feats = self.backbone(x)
        logits, deltas = self.proposal_generator.rpn_head(feats)
        proposals, p_scores = d2_proposals(logits, deltas, img_size,
                                           post_nms_topk=post_nms_topk)
        # d2 Base-RCNN-FPN leaves ROI_BOX_HEAD.POOLER_SAMPLING_RATIO at the
        # detectron2 default 0 (adaptive).
        roi = d2_multilevel_roi_align(feats[:4], proposals,
                                      (4, 8, 16, 32), 7,
                                      sampling_ratio=0)
        feats_fc = self.roi_heads.box_head(roi)
        cls = self.roi_heads.box_predictor.cls_score(feats_fc)
        bbx = self.roi_heads.box_predictor.bbox_pred(feats_fc)
        boxes, scores = d2_box_inference(cls, bbx, proposals, img_size,
                                         topk=max_detections)
        # ROI_KEYPOINT_HEAD.POOLER_SAMPLING_RATIO d2 default 0 (adaptive).
        kp_roi = d2_multilevel_roi_align(feats[:4], boxes,
                                         (4, 8, 16, 32), 14,
                                         sampling_ratio=0)
        heatmaps = self.roi_heads.keypoint_head(kp_roi)
        return {"feats": feats, "rpn_logits": logits, "rpn_deltas": deltas,
                "proposals": proposals, "proposal_scores": p_scores,
                "boxes": boxes, "scores": scores, "heatmaps": heatmaps}


class D2PointRendRCNNTwin(nn.Module):
    def __init__(self, num_classes=80):
        super().__init__()
        self.backbone = Backbone(50)
        self.proposal_generator = nn.Module()
        self.proposal_generator.rpn_head = RPNHead()
        self.roi_heads = nn.Module()
        self.roi_heads.box_head = BoxHead()
        self.roi_heads.box_predictor = BoxPredictor(num_classes=num_classes)
        self.roi_heads.mask_coarse_head = CoarseMaskHead(
            num_classes=num_classes)
        self.roi_heads.mask_point_head = PointHead(num_classes=num_classes)

    def forward(self, image, post_nms_topk=1000, max_detections=100,
                score_thresh=0.05):
        x = image.permute(2, 0, 1)[None]
        img_size = image.shape[0]
        feats = self.backbone(x)
        logits, deltas = self.proposal_generator.rpn_head(feats)
        proposals, _ = d2_proposals(logits, deltas, img_size,
                                    post_nms_topk=post_nms_topk)
        # d2 Base-RCNN-FPN leaves ROI_BOX_HEAD.POOLER_SAMPLING_RATIO at the
        # detectron2 default 0 (adaptive).
        roi = d2_multilevel_roi_align(feats[:4], proposals,
                                      (4, 8, 16, 32), 7,
                                      sampling_ratio=0)
        feats_fc = self.roi_heads.box_head(roi)
        cls = self.roi_heads.box_predictor.cls_score(feats_fc)
        bbx = self.roi_heads.box_predictor.bbox_pred(feats_fc)
        boxes, scores = d2_box_inference(cls, bbx, proposals, img_size,
                                         topk=max_detections,
                                         score_thresh=score_thresh)
        if boxes.shape[0] == 0:
            return {"feats": feats, "boxes": boxes, "scores": scores,
                    "coarse": torch.zeros(
                        0, self.roi_heads.mask_coarse_head.num_classes,
                        7, 7),
                    "refined": torch.zeros(
                        0, self.roi_heads.mask_coarse_head.num_classes,
                        7 * 2 ** 5, 7 * 2 ** 5),
                    "masks": torch.zeros(0, img_size, img_size)}
        # Coarse mask: point-sample p2 at a regular 14x14 grid
        # (roi_heads.py:134-150, IN_FEATURES=['p2']).
        R = boxes.shape[0]
        grid = regular_grid_points(R, 14)
        fine, _ = sample_fine_and_coarse(
            feats[0], torch.zeros(R, 1, 7, 7), boxes, grid)
        coarse = self.roi_heads.mask_coarse_head(
            fine.view(R, fine.shape[1], 14, 14))
        refined = d2_subdivision(self.roi_heads.mask_point_head, coarse,
                                 feats[0], boxes)
        masks = torch.stack([
            d2_paste_mask(refined[i, 0], boxes[i], img_size)
            for i in range(R)]) if R else torch.zeros(0, img_size, img_size)
        return {"feats": feats, "boxes": boxes, "scores": scores,
                "coarse": coarse, "refined": refined, "masks": masks}


class _ASPPPoolingTwin(nn.Sequential):
    """ASPPPooling (densepose_head.py:74-86): global pool -> conv -> GN ->
    ReLU -> bilinear back to the input size (constant broadcast from 1x1)."""

    def __init__(self, cin, cout):
        super().__init__(nn.AdaptiveAvgPool2d(1),
                         nn.Conv2d(cin, cout, 1, bias=False),
                         nn.GroupNorm(32, cout), nn.ReLU())

    def forward(self, x):
        size = x.shape[-2:]
        y = super().forward(x)
        return F.interpolate(y, size=size, mode="bilinear",
                             align_corners=False)


class _ASPPTwin(nn.Module):
    """ASPP (densepose_head.py:89-145) with exact d2 child names."""

    def __init__(self, cin, cout, rates=(6, 12, 56)):
        super().__init__()
        convs = nn.ModuleList()
        convs.append(nn.Sequential(nn.Conv2d(cin, cout, 1, bias=False),
                                   nn.GroupNorm(32, cout), nn.ReLU()))
        for r in rates:
            convs.append(nn.Sequential(
                nn.Conv2d(cin, cout, 3, padding=r, dilation=r, bias=False),
                nn.GroupNorm(32, cout), nn.ReLU()))
        convs.append(_ASPPPoolingTwin(cin, cout))
        self.convs = convs
        self.project = nn.Sequential(
            nn.Conv2d(5 * cout, cout, 1, bias=False), nn.ReLU())

    def forward(self, x):
        return self.project(torch.cat([c(x) for c in self.convs], dim=1))


class _NonLocalTwin(nn.Module):
    """NONLocalBlock2D (densepose_head.py:150-268), sub_sample+bn_layer."""

    def __init__(self, cin):
        super().__init__()
        inter = cin // 2
        self.g = nn.Sequential(nn.Conv2d(cin, inter, 1), nn.MaxPool2d(2))
        self.theta = nn.Conv2d(cin, inter, 1)
        self.phi = nn.Sequential(nn.Conv2d(cin, inter, 1), nn.MaxPool2d(2))
        self.W = nn.Sequential(nn.Conv2d(inter, cin, 1),
                               nn.GroupNorm(32, cin))
        self.inter = inter

    def forward(self, x):
        B = x.shape[0]
        g_x = self.g(x).reshape(B, self.inter, -1).permute(0, 2, 1)
        theta_x = self.theta(x).reshape(B, self.inter, -1).permute(0, 2, 1)
        phi_x = self.phi(x).reshape(B, self.inter, -1)
        attn = F.softmax(torch.matmul(theta_x, phi_x), dim=-1)
        y = torch.matmul(attn, g_x).permute(0, 2, 1).reshape(
            B, self.inter, *x.shape[2:])
        return self.W(y) + x


class DeepLabHeadTwin(nn.Module):
    """DensePoseDeepLabHead twin (densepose_head.py:24-61) with exact d2
    state-dict names: ASPP.convs.{0..4}.*, ASPP.project.0, NLBlock.*,
    body_conv_fcn{i}[.norm].*"""

    def __init__(self, cin=256, hidden=512, n_convs=8, nonlocal_on=False):
        super().__init__()
        self.ASPP = _ASPPTwin(cin, cin)
        self.nonlocal_on = nonlocal_on
        if nonlocal_on:
            self.NLBlock = _NonLocalTwin(cin)
        self.n_convs = n_convs
        c = cin
        for i in range(n_convs):
            layer = Conv2dNorm(c, hidden, 3, padding=1, bias=False,
                               norm=nn.GroupNorm(32, hidden))
            self.add_module(f"body_conv_fcn{i + 1}", layer)
            c = hidden

    def forward(self, x):
        x = self.ASPP(x)
        if self.nonlocal_on:
            x = self.NLBlock(x)
        for i in range(self.n_convs):
            x = F.relu(getattr(self, f"body_conv_fcn{i + 1}")(x))
        return x


class DensePoseV1HeadTwin(nn.Module):
    """DensePoseV1ConvXHead twin (densepose_head.py:271-301): 8 stacked
    3x3 convs of width 512, each followed by ReLU; exact d2 child names
    body_conv_fcn{i}."""

    def __init__(self, cin=256, hidden=512, n_convs=8):
        super().__init__()
        self.n_convs = n_convs
        c = cin
        for i in range(n_convs):
            self.add_module(f"body_conv_fcn{i + 1}",
                            nn.Conv2d(c, hidden, 3, padding=1))
            c = hidden

    def forward(self, x):
        for i in range(self.n_convs):
            x = F.relu(getattr(self, f"body_conv_fcn{i + 1}")(x))
        return x


class DensePosePredictorTwin(nn.Module):
    """DensePosePredictor twin (densepose_head.py:304-345): four k4/s2/p1
    deconv branches (S: 15ch coarse seg, I/U/V: 25ch patches) + 2x bilinear
    (align_corners=False)."""

    def __init__(self, cin=512, n_segm=15, n_patches=25):
        super().__init__()
        self.ann_index_lowres = nn.ConvTranspose2d(cin, n_segm, 4, 2, 1)
        self.index_uv_lowres = nn.ConvTranspose2d(cin, n_patches, 4, 2, 1)
        self.u_lowres = nn.ConvTranspose2d(cin, n_patches, 4, 2, 1)
        self.v_lowres = nn.ConvTranspose2d(cin, n_patches, 4, 2, 1)

    def forward(self, x):
        def interp2d(t):
            return F.interpolate(t, scale_factor=2, mode="bilinear",
                                 align_corners=False)

        return (interp2d(self.ann_index_lowres(x)),
                interp2d(self.index_uv_lowres(x)),
                interp2d(self.u_lowres(x)),
                interp2d(self.v_lowres(x)))


class D2DensePoseRCNNTwin(nn.Module):
    """DensePose-RCNN (R101-FPN s1x config): legacy-aligned ROIAlign box
    pooler (Base-DensePose-RCNN-FPN.yaml POOLER_TYPE 'ROIAlign'), 14^2
    DensePose pooler (config.py:26-27 defaults), V1ConvX head, 4-branch
    predictor, `densepose_inference` label math
    (roi_head.py:29-93, densepose_head.py:403-437)."""

    def __init__(self, depth=101):
        super().__init__()
        self.backbone = Backbone(depth)
        self.proposal_generator = nn.Module()
        self.proposal_generator.rpn_head = RPNHead()
        self.roi_heads = nn.Module()
        self.roi_heads.box_head = BoxHead()
        self.roi_heads.box_predictor = BoxPredictor(num_classes=1)
        self.roi_heads.densepose_head = DensePoseV1HeadTwin()
        self.roi_heads.densepose_predictor = DensePosePredictorTwin()

    def forward(self, image, post_nms_topk=1000, max_detections=100,
                score_thresh=0.05):
        x = image.permute(2, 0, 1)[None]
        img_size = image.shape[0]
        feats = self.backbone(x)
        logits, deltas = self.proposal_generator.rpn_head(feats)
        proposals, _ = d2_proposals(logits, deltas, img_size,
                                    post_nms_topk=post_nms_topk)
        roi = d2_multilevel_roi_align(feats[:4], proposals, (4, 8, 16, 32),
                                      7, aligned=False)
        feats_fc = self.roi_heads.box_head(roi)
        cls = self.roi_heads.box_predictor.cls_score(feats_fc)
        bbx = self.roi_heads.box_predictor.bbox_pred(feats_fc)
        boxes, scores = d2_box_inference(cls, bbx, proposals, img_size,
                                         topk=max_detections,
                                         score_thresh=score_thresh)
        R = boxes.shape[0]
        if R == 0:
            z = torch.zeros(0, 1, 56, 56)
            return {"feats": feats, "boxes": boxes, "scores": scores,
                    "s": z, "i": z, "u": z, "v": z,
                    "part_index": torch.zeros(0, 56, 56, dtype=torch.int64)}
        dp_roi = d2_multilevel_roi_align(feats[:4], boxes, (4, 8, 16, 32),
                                         14, aligned=False)
        head_out = self.roi_heads.densepose_head(dp_roi)
        s, i, u, v = self.roi_heads.densepose_predictor(head_out)
        # densepose label math at the heatmap grid (the resize-to-box happens
        # in DensePoseResult; the repo derives labels at the grid first):
        fg = s.argmax(dim=1) > 0
        part = i.argmax(dim=1)
        part = torch.where(fg, part, torch.zeros_like(part))
        return {"feats": feats, "boxes": boxes, "scores": scores,
                "s": s, "i": i, "u": u, "v": v, "part_index": part}


def randomize_bn_stats(model, seed=0):
    """Make FrozenBN affine + running stats AND GroupNorm affines
    non-trivial so the norm math (eps placement, mean/var wiring) and the
    GN scale/bias conversion routing are actually exercised by parity
    tests — torch's default GN init (weight=1, bias=0) equals flax's, so
    a silently-dropped GN key would otherwise be invisible."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3, generator=g)
                m.running_var.uniform_(0.7, 1.4, generator=g)
                m.weight.uniform_(0.7, 1.3, generator=g)
                m.bias.uniform_(-0.2, 0.2, generator=g)
            elif isinstance(m, nn.GroupNorm):
                m.weight.uniform_(0.7, 1.3, generator=g)
                m.bias.uniform_(-0.2, 0.2, generator=g)


def twin_state_to_d2(model):
    """state_dict -> {name: np.ndarray} like a detectron2 pkl's 'model'."""
    return {k: v.detach().numpy() for k, v in model.state_dict().items()
            if "num_batches_tracked" not in k}
