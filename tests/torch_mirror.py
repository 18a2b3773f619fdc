"""Pure-PyTorch mirror of the supervised Faster R-CNN training step, for the
lockstep training-dynamics differential (PARITY_EVIDENCE residual #1).

This is an INDEPENDENT reimplementation of the same detectron2 semantics the
JAX pipeline rebuilds (reference call chain: daod/modeling/proposal_generator/
rpn.py + roi_heads/*), written with native torch modules on purpose:

  * torch.nn.BatchNorm2d  — torch's running-stat bookkeeping (unbiased
    variance, momentum=0.1) vs flax's (biased variance, momentum=0.9);
  * torch.optim.SGD       — torch's coupled weight-decay + momentum update
    vs optax add_decayed_weights + sgd;
  * torchvision roi_align/nms — the CUDA-semantics ops the reference uses.

So a lockstep run measures the JOINT drift of our optax/flax/functional-BN
stack against the reference's torch stack over many steps — exactly the
residual PARITY_EVIDENCE.md could previously only bound component-wise.

Determinism contract (so the two frameworks see identical decisions, not
just similar ones): sampling is configured to "take everything" — the RPN
batch size >= #anchors and ROI batch size >= #candidates with positive
fraction 1.0 — which makes detectron2's subsampling the identity on both
sides (see tests/test_lockstep_torch.py::lockstep_config).
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np
import torch
import torch.nn.functional as F

SCALE_CLAMP = math.log(1000.0 / 16)


def tv_nms(boxes: torch.Tensor, scores: torch.Tensor, thresh: float,
           max_keep: int = None) -> torch.Tensor:
    """Greedy NMS (torchvision semantics: suppress IoU > thresh), pure torch.
    torchvision is not in this image, so the greedy algorithm is written out;
    with `max_keep` it stops after that many keeps — exact, because greedy
    keeps arrive in descending score order."""
    order = torch.argsort(scores, descending=True)
    boxes = boxes[order]
    iou = pairwise_iou(boxes, boxes)
    n = boxes.shape[0]
    alive = torch.ones(n, dtype=torch.bool)
    keep = []
    for _ in range(n):
        idx = alive.nonzero(as_tuple=True)[0]
        if idx.numel() == 0:
            break
        pick = idx[0]  # highest-scoring survivor (boxes are score-sorted)
        keep.append(pick)
        if max_keep is not None and len(keep) >= max_keep:
            break
        alive &= iou[pick] <= thresh
        alive[pick] = False
    return order[torch.stack(keep)] if keep else torch.zeros(0, dtype=torch.long)


def tv_roi_align(feat: torch.Tensor, rois: torch.Tensor, output_size,
                 spatial_scale: float, sampling_ratio: int,
                 aligned: bool = True) -> torch.Tensor:
    """ROIAlign (torchvision `aligned=True` semantics — the exact math of
    tests/golden.py's scalar oracle), vectorised and differentiable w.r.t.
    `feat`. feat [B, C, H, W]; rois [N, 5] (batch_idx, x1, y1, x2, y2) ->
    [N, C, P, P]."""
    out = output_size[0]
    s = sampling_ratio
    b_idx = rois[:, 0].long()
    n = rois.shape[0]
    h, w = feat.shape[2], feat.shape[3]
    off = 0.5 if aligned else 0.0
    x1 = rois[:, 1] * spatial_scale - off
    y1 = rois[:, 2] * spatial_scale - off
    x2 = rois[:, 3] * spatial_scale - off
    y2 = rois[:, 4] * spatial_scale - off
    bw = (x2 - x1) / out
    bh = (y2 - y1) / out
    grid = torch.arange(out * s, dtype=feat.dtype)
    frac = grid // s + ((grid % s) + 0.5) / s  # [out*s] in bin units
    ys = y1[:, None] + frac[None, :] * bh[:, None]  # [N, out*s]
    xs = x1[:, None] + frac[None, :] * bw[:, None]

    def gather_axis(p, dim):
        ok = (p >= -1.0) & (p <= dim)
        pc = p.clamp(0.0, dim - 1)
        p0 = pc.floor().long()
        p1 = (p0 + 1).clamp(max=dim - 1)
        lp = pc - p0.to(feat.dtype)
        return ok, p0, p1, lp

    oky, ye0, ye1, ly = gather_axis(ys, h)
    okx, xe0, xe1, lx = gather_axis(xs, w)
    fb = feat[b_idx]  # [N, C, H, W]
    ar = torch.arange(n)[:, None, None]

    def corner(yi, xi):
        # [N, out*s, out*s] gather -> [N, C, out*s, out*s]
        return fb[ar, :, yi[:, :, None], xi[:, None, :]].permute(0, 3, 1, 2)

    v = (
        corner(ye0, xe0) * ((1 - ly)[:, :, None] * (1 - lx)[:, None, :])[:, None]
        + corner(ye0, xe1) * ((1 - ly)[:, :, None] * lx[:, None, :])[:, None]
        + corner(ye1, xe0) * (ly[:, :, None] * (1 - lx)[:, None, :])[:, None]
        + corner(ye1, xe1) * (ly[:, :, None] * lx[:, None, :])[:, None]
    )
    mask = (oky[:, :, None] & okx[:, None, :]).to(feat.dtype)[:, None]
    v = v * mask
    v = v.reshape(n, -1, out, s, out, s).mean(dim=(3, 5))
    return v


# ---------------------------------------------------------------------------
# box math (d2 Box2BoxTransform / pairwise_iou, torch edition)
# ---------------------------------------------------------------------------


def encode_deltas(src: torch.Tensor, tgt: torch.Tensor, weights) -> torch.Tensor:
    sw = (src[..., 2] - src[..., 0]).clamp_min(1e-6)
    sh = (src[..., 3] - src[..., 1]).clamp_min(1e-6)
    scx = src[..., 0] + 0.5 * sw
    scy = src[..., 1] + 0.5 * sh
    tw = (tgt[..., 2] - tgt[..., 0]).clamp_min(1e-6)
    th = (tgt[..., 3] - tgt[..., 1]).clamp_min(1e-6)
    tcx = tgt[..., 0] + 0.5 * (tgt[..., 2] - tgt[..., 0])
    tcy = tgt[..., 1] + 0.5 * (tgt[..., 3] - tgt[..., 1])
    wx, wy, ww, wh = weights
    return torch.stack(
        [
            wx * (tcx - scx) / sw,
            wy * (tcy - scy) / sh,
            ww * torch.log(tw / sw),
            wh * torch.log(th / sh),
        ],
        dim=-1,
    )


def decode_deltas(deltas: torch.Tensor, boxes: torch.Tensor, weights) -> torch.Tensor:
    """deltas [..., 4k], boxes [..., 4] -> [..., 4k]."""
    w = (boxes[..., 2] - boxes[..., 0]).clamp_min(1e-6)
    h = (boxes[..., 3] - boxes[..., 1]).clamp_min(1e-6)
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    wx, wy, ww, wh = weights
    d = deltas.reshape(*deltas.shape[:-1], -1, 4)
    dx = d[..., 0] / wx
    dy = d[..., 1] / wy
    dw = (d[..., 2] / ww).clamp_max(SCALE_CLAMP)
    dh = (d[..., 3] / wh).clamp_max(SCALE_CLAMP)
    pcx = dx * w[..., None] + cx[..., None]
    pcy = dy * h[..., None] + cy[..., None]
    pw = torch.exp(dw) * w[..., None]
    ph = torch.exp(dh) * h[..., None]
    out = torch.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], dim=-1
    )
    return out.reshape(*deltas.shape)


def pairwise_iou(a: torch.Tensor, b: torch.Tensor) -> torch.Tensor:
    """[N, 4] x [M, 4] -> [N, M]."""
    lt = torch.maximum(a[:, None, :2], b[None, :, :2])
    rb = torch.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp_min(0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))[:, None]
    area_b = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[None, :]
    union = area_a + area_b - inter
    return torch.where(union > 0, inter / union.clamp_min(1e-30), torch.zeros_like(inter))


def clip_boxes(boxes: torch.Tensor, hw: Tuple[int, int]) -> torch.Tensor:
    h, w = hw
    return torch.stack(
        [
            boxes[..., 0].clamp(0, w),
            boxes[..., 1].clamp(0, h),
            boxes[..., 2].clamp(0, w),
            boxes[..., 3].clamp(0, h),
        ],
        dim=-1,
    )


def match_boxes(iou: torch.Tensor, thresholds, labels, allow_low_quality):
    """d2 Matcher. iou [M_gt, N]. Returns (matched_idx [N], match_labels [N])."""
    if iou.numel() == 0:
        n = iou.shape[1]
        return torch.zeros(n, dtype=torch.long), torch.zeros(n, dtype=torch.long)
    vals, idx = iou.max(dim=0)
    out = torch.full_like(vals, labels[0], dtype=torch.long)
    for thr, lbl in zip(thresholds, labels[1:]):
        out = torch.where(vals >= thr, torch.tensor(lbl), out)
    if allow_low_quality:
        per_gt_best = iou.max(dim=1, keepdim=True).values  # [M, 1]
        is_best = (iou >= per_gt_best) & (per_gt_best > 0)
        low_quality = is_best.any(dim=0)
        out = torch.where(low_quality, torch.tensor(1), out)
    return idx, out


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------


class TorchTinyFasterRCNN(torch.nn.Module):
    """Mirror of FasterRCNN(cfg backbone='tiny'): 2x (conv3x3 -> BN -> relu ->
    maxpool2), RPN head, 2-FC box head, predictor. NCHW."""

    def __init__(self, num_classes: int, num_anchors: int, fc_dim: int, pooler: int,
                 width: int = 16, bn: bool = True):
        super().__init__()
        self.bn = bn
        self.conv0 = torch.nn.Conv2d(3, width, 3, padding=1)
        self.conv1 = torch.nn.Conv2d(width, width, 3, padding=1)
        if bn:
            self.bn0 = torch.nn.BatchNorm2d(width, eps=1e-5, momentum=0.1)
            self.bn1 = torch.nn.BatchNorm2d(width, eps=1e-5, momentum=0.1)
        self.rpn_conv = torch.nn.Conv2d(width, width, 3, padding=1)
        self.rpn_obj = torch.nn.Conv2d(width, num_anchors, 1)
        self.rpn_delta = torch.nn.Conv2d(width, num_anchors * 4, 1)
        self.fc0 = torch.nn.Linear(width * pooler * pooler, fc_dim)
        self.fc1 = torch.nn.Linear(fc_dim, fc_dim)
        self.cls_score = torch.nn.Linear(fc_dim, num_classes + 1)
        self.bbox_pred = torch.nn.Linear(fc_dim, num_classes * 4)
        self.pooler = pooler

    def features(self, x: torch.Tensor) -> torch.Tensor:
        x = self.conv0(x)
        if self.bn:
            x = self.bn0(x)
        x = F.max_pool2d(F.relu(x), 2)
        x = self.conv1(x)
        if self.bn:
            x = self.bn1(x)
        return F.max_pool2d(F.relu(x), 2)

    def rpn(self, feat: torch.Tensor):
        """-> (objectness [B, h*w*A], deltas [B, h*w*A, 4]) in the NHWC
        flatten order the JAX side uses (anchors.py grid order)."""
        t = F.relu(self.rpn_conv(feat))
        b = feat.shape[0]
        obj = self.rpn_obj(t).permute(0, 2, 3, 1).reshape(b, -1)
        dl = self.rpn_delta(t).permute(0, 2, 3, 1).reshape(b, -1, 4)
        return obj, dl

    def box(self, pooled: torch.Tensor):
        """pooled [N, C, P, P] -> (scores, deltas). Flatten in NHWC order to
        match the flax box head's fc0 weight layout."""
        x = pooled.permute(0, 2, 3, 1).reshape(pooled.shape[0], -1)
        x = F.relu(self.fc0(x))
        x = F.relu(self.fc1(x))
        return self.cls_score(x), self.bbox_pred(x)

    # -- weight transplant from the flax detector ---------------------------

    def load_flax(self, params: Dict, batch_stats: Dict) -> None:
        """Copy a flax FasterRCNN(tiny) variables tree into this module."""

        def conv(m, p):
            m.weight.data = torch.from_numpy(
                np.asarray(p["kernel"]).transpose(3, 2, 0, 1).copy()
            )
            m.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())

        def dense(m, p):
            m.weight.data = torch.from_numpy(np.asarray(p["kernel"]).T.copy())
            m.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())

        bb = params["backbone"]
        conv(self.conv0, bb["conv0"])
        conv(self.conv1, bb["conv1"])
        if self.bn:
            sb = batch_stats["backbone"]
            for i, m in ((0, self.bn0), (1, self.bn1)):
                m.weight.data = torch.from_numpy(np.asarray(bb[f"bn{i}"]["scale"]).copy())
                m.bias.data = torch.from_numpy(np.asarray(bb[f"bn{i}"]["bias"]).copy())
                m.running_mean.data = torch.from_numpy(np.asarray(sb[f"bn{i}"]["mean"]).copy())
                m.running_var.data = torch.from_numpy(np.asarray(sb[f"bn{i}"]["var"]).copy())
        conv(self.rpn_conv, params["rpn_head"]["conv"])
        conv(self.rpn_obj, params["rpn_head"]["objectness"])
        conv(self.rpn_delta, params["rpn_head"]["deltas"])
        dense(self.fc0, params["box_head"]["fc0"])
        dense(self.fc1, params["box_head"]["fc1"])
        dense(self.cls_score, params["predictor"]["cls_score"])
        dense(self.bbox_pred, params["predictor"]["bbox_pred"])

    def export_flax_like(self) -> Dict[str, np.ndarray]:
        """Flat {path: array} view in flax layout for drift comparison."""
        out = {}

        def conv(name, m):
            out[f"{name}/kernel"] = m.weight.detach().numpy().transpose(2, 3, 1, 0)
            out[f"{name}/bias"] = m.bias.detach().numpy()

        def dense(name, m):
            out[f"{name}/kernel"] = m.weight.detach().numpy().T
            out[f"{name}/bias"] = m.bias.detach().numpy()

        conv("backbone/conv0", self.conv0)
        conv("backbone/conv1", self.conv1)
        if self.bn:
            for i, m in ((0, self.bn0), (1, self.bn1)):
                out[f"backbone/bn{i}/scale"] = m.weight.detach().numpy()
                out[f"backbone/bn{i}/bias"] = m.bias.detach().numpy()
                out[f"backbone/bn{i}/mean"] = m.running_mean.detach().numpy()
                out[f"backbone/bn{i}/var"] = m.running_var.detach().numpy()
        conv("rpn_head/conv", self.rpn_conv)
        conv("rpn_head/objectness", self.rpn_obj)
        conv("rpn_head/deltas", self.rpn_delta)
        dense("box_head/fc0", self.fc0)
        dense("box_head/fc1", self.fc1)
        dense("predictor/cls_score", self.cls_score)
        dense("predictor/bbox_pred", self.bbox_pred)
        return out


# ---------------------------------------------------------------------------
# supervised step (loss + SGD), d2 semantics
# ---------------------------------------------------------------------------


class TorchLockstepTrainer:
    """One supervised Faster R-CNN step per call, matching the JAX side's
    Detector.supervised_losses + optax SGD under the take-all sampling
    contract."""

    def __init__(self, model: TorchTinyFasterRCNN, cfg, anchors: np.ndarray,
                 lr: float, momentum: float, weight_decay: float):
        self.model = model
        self.cfg = cfg
        self.anchors = torch.from_numpy(np.asarray(anchors, np.float32).copy())
        # d2's get_default_optimizer_params: norm-layer params take
        # SOLVER.WEIGHT_DECAY_NORM (default 0.0), everything else
        # WEIGHT_DECAY — mirrored by the JAX side's norm_param_mask
        norm_params, other_params = [], []
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                norm_params.extend(p for p in m.parameters(recurse=False))
        norm_ids = {id(p) for p in norm_params}
        other_params = [p for p in model.parameters() if id(p) not in norm_ids]
        self.opt = torch.optim.SGD(
            [
                {"params": other_params, "weight_decay": weight_decay},
                {"params": norm_params, "weight_decay": 0.0},
            ],
            lr=lr, momentum=momentum,
        )
        self.rpn_w = (1.0, 1.0, 1.0, 1.0)
        self.roi_w = (10.0, 10.0, 5.0, 5.0)

    def _rpn_select(self, labels: torch.Tensor):
        """RPN anchor selection hook: (selected mask, selected-positive mask).
        Base = take-all contract (batch size >= #anchors selects everything);
        TorchRealSamplingMirror overrides with d2 subsample_labels."""
        return labels >= 0, labels == 1

    def _roi_select(self, labels: torch.Tensor) -> torch.Tensor:
        """ROI candidate selection hook: indices into the proposal pool.
        Base = take-all contract; TorchRealSamplingMirror overrides."""
        assert labels.shape[0] <= self.cfg.roi_batch_size_per_image, (
            f"take-all contract violated: {labels.shape[0]} candidates"
        )
        return torch.arange(labels.shape[0])

    def _rpn_losses(self, obj, deltas, gt_boxes: List[torch.Tensor]):
        cfg = self.cfg
        b = obj.shape[0]
        normalizer = float(b * cfg.rpn_batch_size_per_image)
        loss_cls = obj.new_zeros(())
        loss_loc = obj.new_zeros(())
        for i in range(b):
            iou = pairwise_iou(gt_boxes[i], self.anchors)
            matched_idx, labels = match_boxes(iou, (0.3, 0.7), (0, -1, 1), True)
            sel, pos = self._rpn_select(labels)
            tgt = pos.float()  # == (labels == 1) on selected entries
            ce = F.binary_cross_entropy_with_logits(obj[i], tgt, reduction="none")
            loss_cls = loss_cls + (ce * sel.float()).sum() / normalizer
            matched_gt = gt_boxes[i][matched_idx] if gt_boxes[i].numel() else torch.zeros_like(self.anchors)
            reg_t = encode_deltas(self.anchors, matched_gt, self.rpn_w)
            l1 = (deltas[i] - reg_t).abs().sum(-1)
            loss_loc = loss_loc + (l1 * pos.float()).sum() / normalizer
        return loss_cls, loss_loc

    def _propose(self, obj, deltas, hw, training=True):
        """find_top_rpn_proposals: per-image pre-NMS top-k by objectness,
        NMS, post-NMS top-k (matches models/faster_rcnn.py propose())."""
        cfg = self.cfg
        pre_k = cfg.rpn_pre_nms_topk_train if training else cfg.rpn_pre_nms_topk_test
        pre_k = min(pre_k, self.anchors.shape[0])
        post_k = cfg.rpn_post_nms_topk_train if training else cfg.rpn_post_nms_topk_test
        out = []
        for i in range(obj.shape[0]):
            vals, top = obj[i].topk(pre_k)
            boxes = decode_deltas(deltas[i][top], self.anchors[top], self.rpn_w)
            boxes = clip_boxes(boxes, hw)
            valid = ((boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
                     & torch.isfinite(vals))
            idx = valid.nonzero(as_tuple=True)[0]
            keep = tv_nms(boxes[idx], vals[idx], cfg.rpn_nms_thresh, max_keep=post_k)
            keep = idx[keep]
            out.append(boxes[keep].detach())
        return out

    def normalize(self, images_nchw: np.ndarray) -> torch.Tensor:
        cfg = self.cfg
        x = torch.from_numpy(images_nchw.astype(np.float32))
        mean = torch.tensor(cfg.pixel_mean).view(1, 3, 1, 1)
        std = torch.tensor(cfg.pixel_std).view(1, 3, 1, 1)
        return (x - mean) / std

    def step(self, images_nchw: np.ndarray, gt_boxes: List[np.ndarray],
             gt_classes: List[np.ndarray], hw: Tuple[int, int]):
        m = self.model
        m.train()
        feat = m.features(self.normalize(images_nchw))
        gtb = [torch.from_numpy(np.asarray(g, np.float32)) for g in gt_boxes]
        gtc = [torch.from_numpy(np.asarray(c, np.int64)) for c in gt_classes]
        total, parts = self.sup_losses_from_feature(feat, gtb, gtc, hw)
        self.opt.zero_grad()
        total.backward()
        self.opt.step()
        parts["total_loss"] = float(total.detach())
        return parts

    def sup_losses_from_feature(self, feat: torch.Tensor, gtb: List[torch.Tensor],
                                gtc: List[torch.Tensor], hw: Tuple[int, int]):
        """Supervised RPN+ROI losses on a precomputed feature (mirrors
        Detector.losses_from_feature under the take-all contract)."""
        cfg = self.cfg
        m = self.model
        obj, deltas = m.rpn(feat)
        loss_rpn_cls, loss_rpn_loc = self._rpn_losses(obj, deltas, gtb)
        proposals = self._propose(obj, deltas, hw)

        # ROI: pool = proposals + gt (proposal_append_gt), match, take all
        rois, cls_t, reg_t, fg_mask = [], [], [], []
        total_sampled = 0
        for i, props in enumerate(proposals):
            pool = torch.cat([props, gtb[i]], dim=0)
            iou = pairwise_iou(gtb[i], pool)
            matched_idx, labels = match_boxes(iou, (0.5,), (0, 1), False)
            keep = self._roi_select(labels)  # take-all: everything
            pool, labels, matched_idx = pool[keep], labels[keep], matched_idx[keep]
            is_fg = labels == 1
            if gtb[i].numel():
                cls = torch.where(is_fg, gtc[i][matched_idx], torch.tensor(cfg.num_classes))
                rt = encode_deltas(pool, gtb[i][matched_idx], self.roi_w)
            else:
                # no (pseudo) GT: everything background; regression targets
                # are masked out by is_fg (all False) on both frameworks
                cls = torch.full((pool.shape[0],), cfg.num_classes, dtype=torch.long)
                rt = encode_deltas(pool, torch.zeros_like(pool), self.roi_w)
            batch_col = torch.full((pool.shape[0], 1), float(i))
            rois.append(torch.cat([batch_col, pool], dim=1))
            cls_t.append(cls)
            reg_t.append(rt)
            fg_mask.append(is_fg)
            total_sampled += pool.shape[0]
        rois = torch.cat(rois)
        cls_t = torch.cat(cls_t)
        reg_t = torch.cat(reg_t)
        fg_mask = torch.cat(fg_mask)

        pooled = tv_roi_align(
            feat, rois, (m.pooler, m.pooler), spatial_scale=0.25,
            sampling_ratio=cfg.pooler_sampling_ratio, aligned=True,
        )
        scores, box_deltas = m.box(pooled)
        denom = float(total_sampled)
        loss_cls = F.cross_entropy(scores, cls_t, reduction="sum") / denom
        k = box_deltas.shape[-1] // 4
        d = box_deltas.reshape(-1, k, 4)
        cls_idx = cls_t.clamp(0, k - 1)
        fg_d = d[torch.arange(d.shape[0]), cls_idx]
        l1 = (fg_d - reg_t).abs().sum(-1)
        loss_reg = (l1 * fg_mask.float()).sum() / denom

        total = loss_rpn_cls + loss_rpn_loc + loss_cls + loss_reg
        return total, {
            "loss_rpn_cls": float(loss_rpn_cls.detach()),
            "loss_rpn_loc": float(loss_rpn_loc.detach()),
            "loss_cls": float(loss_cls.detach()),
            "loss_box_reg": float(loss_reg.detach()),
        }


# ---------------------------------------------------------------------------
# SFAT `_single` adaptation step (teacher inference -> pseudo labels ->
# student update -> EMA), d2/reference semantics
# ---------------------------------------------------------------------------


class TorchSFATSingleMirror(TorchLockstepTrainer):
    """Pure-torch mirror of the `_single` source-free adaptation step under
    the lockstep contract (SEMISUPNET.SPLIT_VIEW_BN=True, flip / strong aug /
    DC / adaptive-threshold off — so the weak and strong views are the same
    pixels and what remains is the adaptation semantics itself):

      1. weak pass: train-mode BN forward (running-stat nudge #1); the
         reference's always-train-mode student, sfat _single :390;
      2. test-time inference on those features (find_top_rpn_proposals +
         fast_rcnn_inference: score thresh, per-class NMS, top-k) and the
         BBOX_THRESHOLD >= cut -> pseudo GT (threshold_bbox, sfat.py:150);
      3. strong pass: second train-mode forward (nudge #2), supervised
         RPN+ROI losses vs the pseudo GT x UNSUP_LOSS_WEIGHT;
      4. SGD step, then the EMA teacher tree update (sfat.py:583-603).
    """

    def __init__(self, model: TorchTinyFasterRCNN, cfg, anchors: np.ndarray,
                 lr: float, momentum: float, weight_decay: float,
                 bbox_threshold: float = 0.8, unsup_weight: float = 1.0,
                 ema_keep_rate: float = 0.99):
        super().__init__(model, cfg, anchors, lr, momentum, weight_decay)
        self.bbox_threshold = bbox_threshold
        self.unsup_weight = unsup_weight
        self.keep_rate = ema_keep_rate
        self.teacher = {k: v.copy() for k, v in model.export_flax_like().items()}
        # Fixed-teacher MAIN variant (reference sfat.py: pseudo from a
        # separate model_teacher that is never .eval()'d, EMA at :581
        # commented out): set to a second TorchTinyFasterRCNN and
        # adapt_step detects with ITS heads on ITS train-mode features
        # (nudging ITS running stats), with no EMA update.
        self.teacher_model = None

    @torch.no_grad()
    def detect(self, feat: torch.Tensor, hw: Tuple[int, int], model=None):
        """Detector.infer_from_feature: RPN propose (test top-k) -> ROIAlign
        -> box head -> fast_rcnn_inference (softmax minus background column,
        per-class decode+clip, score > SCORE_THRESH_TEST, per-class NMS,
        DETECTIONS_PER_IMAGE top-k). Returns per-image (boxes, scores,
        classes), score-descending. `model` overrides the head-owner (the
        fixed-teacher main variant detects with the TEACHER's heads)."""
        cfg = self.cfg
        m = model if model is not None else self.model
        obj, deltas = m.rpn(feat)
        proposals = self._propose(obj, deltas, hw, training=False)
        empty = (torch.zeros(0, 4), torch.zeros(0), torch.zeros(0, dtype=torch.long))
        out = []
        for i, props in enumerate(proposals):
            if props.shape[0] == 0:
                out.append(empty)
                continue
            batch_col = torch.full((props.shape[0], 1), float(i))
            pooled = tv_roi_align(
                feat, torch.cat([batch_col, props], dim=1), (m.pooler, m.pooler),
                spatial_scale=0.25, sampling_ratio=cfg.pooler_sampling_ratio,
                aligned=True,
            )
            scores, box_deltas = m.box(pooled)
            probs = F.softmax(scores, dim=-1)[:, :-1]  # [R, C]
            c = probs.shape[1]
            boxes_k = decode_deltas(box_deltas, props, self.roi_w)  # [R, 4C]
            boxes_k = clip_boxes(boxes_k.reshape(-1, c, 4), hw)
            flat_boxes = boxes_k.reshape(-1, 4)
            flat_scores = probs.reshape(-1)
            flat_classes = torch.arange(c).repeat(props.shape[0])
            valid = (
                (flat_boxes[:, 2] > flat_boxes[:, 0])
                & (flat_boxes[:, 3] > flat_boxes[:, 1])
                & (flat_scores > cfg.score_thresh_test)
            )
            keep_all = []
            for cl in range(c):
                idx = ((flat_classes == cl) & valid).nonzero(as_tuple=True)[0]
                if idx.numel() == 0:
                    continue
                keep = tv_nms(flat_boxes[idx], flat_scores[idx], cfg.nms_thresh_test)
                keep_all.append(idx[keep])
            if not keep_all:
                out.append(empty)
                continue
            keep_all = torch.cat(keep_all)
            order = torch.argsort(flat_scores[keep_all], descending=True)
            keep_all = keep_all[order][: cfg.detections_per_image]
            out.append((flat_boxes[keep_all], flat_scores[keep_all], flat_classes[keep_all]))
        return out

    def adapt_step(self, images_nchw: np.ndarray, hw: Tuple[int, int]):
        m = self.model
        m.train()
        x = self.normalize(images_nchw)
        src = self.teacher_model if self.teacher_model is not None else m
        src.train()  # pseudo forward is ALWAYS train-mode (ref never .eval()s)
        with torch.no_grad():
            feat_w = src.features(x)  # weak pass: BN running-stat nudge #1
            dets = self.detect(feat_w, hw, model=src)
        pseudo_boxes, pseudo_classes = [], []
        n_pseudo = 0
        for boxes, scores, classes in dets:
            sel = scores > self.bbox_threshold  # threshold_bbox: strict > (ref :168)
            pseudo_boxes.append(boxes[sel])
            pseudo_classes.append(classes[sel])
            n_pseudo += int(sel.sum())
        feat_s = m.features(x)  # strong pass: nudge #2, gradients flow
        total, parts = self.sup_losses_from_feature(
            feat_s, pseudo_boxes, pseudo_classes, hw
        )
        total = total * self.unsup_weight
        self.opt.zero_grad()
        total.backward()
        self.opt.step()
        if self.teacher_model is None:
            # EMA on the post-step tree (params + BN running stats),
            # reference _update_teacher_model (_single/_mosaic variants)
            ex = m.export_flax_like()
            for k in self.teacher:
                self.teacher[k] = (
                    self.keep_rate * self.teacher[k] + (1.0 - self.keep_rate) * ex[k]
                )
        else:
            # fixed teacher: params frozen; only the running stats moved
            # (nudged by the train-mode pseudo forward above)
            self.teacher = {
                k: v.copy() for k, v in self.teacher_model.export_flax_like().items()
            }
        parts["total_loss"] = float(total.detach())
        parts["num_pseudo"] = n_pseudo
        parts["pseudo_classes"] = np.sort(
            np.concatenate([c.numpy() for c in pseudo_classes])
        ) if n_pseudo else np.zeros((0,), np.int64)
        return parts


# ---------------------------------------------------------------------------
# Real-sampling mirror (take-all OFF) for the endpoint train-to-AP A/B
# ---------------------------------------------------------------------------


class TorchRealSamplingMirror(TorchSFATSingleMirror):
    """TorchLockstepTrainer with detectron2's REAL subsampling (the take-all
    contract off): RPN anchors and ROI proposals are randomly subsampled per
    d2 `subsample_labels` (num_pos = min(#pos, batch*fraction), num_neg fills
    the rest, uniform without replacement) from a private torch RNG stream.
    Used by tools/endpoint_ab.py — the two frameworks intentionally draw
    DIFFERENT sampling streams, and only the trained-to endpoint (AP through
    the same evaluator) is compared. Inherits detect() for eval."""

    def __init__(self, model, cfg, anchors, lr, momentum, weight_decay,
                 rpn_positive_fraction: float = 0.5,
                 roi_positive_fraction: float = 0.25,
                 sample_seed: int = 0):
        super().__init__(model, cfg, anchors, lr=lr, momentum=momentum,
                         weight_decay=weight_decay)
        self.rpn_pos_frac = rpn_positive_fraction
        self.roi_pos_frac = roi_positive_fraction
        self.gen = torch.Generator().manual_seed(sample_seed)

    def _subsample(self, labels: torch.Tensor, num: int, frac: float):
        pos = (labels == 1).nonzero(as_tuple=True)[0]
        neg = (labels == 0).nonzero(as_tuple=True)[0]
        n_pos = min(pos.numel(), int(num * frac))
        n_neg = min(neg.numel(), num - n_pos)
        pos = pos[torch.randperm(pos.numel(), generator=self.gen)[:n_pos]]
        neg = neg[torch.randperm(neg.numel(), generator=self.gen)[:n_neg]]
        return pos, neg

    def _rpn_select(self, labels):
        pos, neg = self._subsample(
            labels, self.cfg.rpn_batch_size_per_image, self.rpn_pos_frac
        )
        sel = torch.zeros(labels.shape[0], dtype=torch.bool)
        sel[pos] = True
        sel[neg] = True
        posm = torch.zeros_like(sel)
        posm[pos] = True
        return sel, posm

    def _roi_select(self, labels):
        pos, neg = self._subsample(
            labels, self.cfg.roi_batch_size_per_image, self.roi_pos_frac
        )
        return torch.cat([pos, neg])


# ---------------------------------------------------------------------------
# DA-Faster domain-adversarial loss core (reference
# daod/modeling/meta_arch/da_faster_rcnn.py:228-273 + dann.py:33-155 +
# cda_faster_rcnn.py:248-300), torch edition — consumed by
# tests/test_da_lockstep.py to differential the repo's
# engine/trainers/da.dc_losses value AND gradient paths (the GRL scalings).
# ---------------------------------------------------------------------------


class TorchGRL(torch.autograd.Function):
    """GradientScalarLayer (reference dann.py:33-50): identity forward,
    gradient scaled by alpha backward."""

    @staticmethod
    def forward(ctx, x, alpha):
        ctx.alpha = alpha
        return x.view_as(x)

    @staticmethod
    def backward(ctx, g):
        return g * ctx.alpha, None


def grl(x: torch.Tensor, alpha: float) -> torch.Tensor:
    return TorchGRL.apply(x, alpha)


class TorchDAImgHead(torch.nn.Module):
    """DAImgHead (reference dann.py:54-94): 1x1 conv C->512, relu, 1x1 -> 1."""

    def __init__(self, in_ch: int):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(in_ch, 512, 1)
        self.conv2 = torch.nn.Conv2d(512, 1, 1)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        return self.conv2(F.relu(self.conv1(x)))

    def load_flax(self, p: Dict) -> None:
        with torch.no_grad():
            for name, m in (("conv1", self.conv1), ("conv2", self.conv2)):
                k = np.asarray(p[name]["kernel"])  # HWIO
                m.weight.copy_(torch.from_numpy(k).permute(3, 2, 0, 1))
                m.bias.copy_(torch.from_numpy(np.asarray(p[name]["bias"])))


class TorchDAInsHead(torch.nn.Module):
    """DAInsHead (reference dann.py:97-155): fc 1024 -> dropout -> fc 1024 ->
    dropout -> fc 1. Used in eval mode by the differential (dropout off on
    both sides — dc_losses(deterministic=True))."""

    def __init__(self, in_dim: int):
        super().__init__()
        self.fc1 = torch.nn.Linear(in_dim, 1024)
        self.fc2 = torch.nn.Linear(1024, 1024)
        self.fc3 = torch.nn.Linear(1024, 1)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = F.relu(self.fc1(x))
        x = F.relu(self.fc2(x))
        return self.fc3(x)

    def load_flax(self, p: Dict) -> None:
        with torch.no_grad():
            for name, m in (("fc1", self.fc1), ("fc2", self.fc2), ("fc3", self.fc3)):
                m.weight.copy_(torch.from_numpy(np.asarray(p[name]["kernel"]).T))
                m.bias.copy_(torch.from_numpy(np.asarray(p[name]["bias"])))


def torch_dc_losses(
    model: "TorchTinyFasterRCNN",
    img_head: TorchDAImgHead,
    ins_head: TorchDAInsHead,
    feat: torch.Tensor,  # [B, C, h, w], requires_grad for the differential
    boxes: torch.Tensor,  # [B, R, 4] image-coordinate XYXY (stop-gradient)
    domain_label: float,
    *,
    w_img: float,
    w_ins: float,
    w_cst: float,
    conditional: bool,
    entropy_conditioning: bool,
    stride: int,
    pooler: int,
    sampling_ratio: int,
):
    """Direct transcription of the reference's image_dc_loss /
    instance_dc_loss / consistency_loss for a single-level backbone
    (da_faster_rcnn.py:228-273; CDA multilinear+entropy
    cda_faster_rcnn.py:248-300). Proposal boxes are taken as inputs — the
    reference detaches them too (RPN gradients reach the DC losses through
    nothing), and the repo's propose() is lockstep-proven elsewhere."""
    b, r = boxes.shape[0], boxes.shape[1]

    # image-level BCE behind GRL(-w_img)
    img_out = img_head(grl(feat, -w_img))
    img_tgt = torch.full_like(img_out, domain_label)
    loss_img = F.binary_cross_entropy_with_logits(img_out, img_tgt)

    # pooled box-head features (b-major flatten, matching pool_rois)
    rois = torch.cat(
        [
            torch.repeat_interleave(torch.arange(b, dtype=feat.dtype), r)[:, None],
            boxes.reshape(-1, 4),
        ],
        dim=1,
    )
    pooled = tv_roi_align(feat, rois, (pooler, pooler), 1.0 / stride, sampling_ratio)
    x = pooled.permute(0, 2, 3, 1).reshape(pooled.shape[0], -1)  # NHWC flatten
    feats = F.relu(model.fc1(F.relu(model.fc0(x))))
    probs = None
    if conditional:
        probs = F.softmax(model.cls_score(feats).detach(), dim=-1)
        feats = (feats[:, :, None] * probs[:, None, :]).reshape(feats.shape[0], -1)

    # instance-level BCE behind GRL(-w_ins) (+ CDAN entropy conditioning)
    ins_out = ins_head(grl(feats, -w_ins))
    ins_tgt = torch.full_like(ins_out, domain_label)
    ins_bce = F.binary_cross_entropy_with_logits(ins_out, ins_tgt, reduction="none")
    if entropy_conditioning:
        ent = -(probs * torch.log(probs + 1e-5)).sum(-1)
        w = 1.0 + torch.exp(-ent)
        w = w / w.mean()
        ins_bce = ins_bce * w.reshape(ins_out.shape)
    loss_ins = ins_bce.mean()

    # consistency: ROI-pooled image prob map vs instance probs, each path
    # through POSITIVE GRL(w_cst * w) — weight scales gradients, not values
    img_out_c = img_head(grl(feat, w_cst * w_img))
    prob_map = torch.sigmoid(img_out_c)
    roi_probs = tv_roi_align(
        prob_map, rois, (pooler, pooler), 1.0 / stride, sampling_ratio
    ).mean(dim=(1, 2, 3))
    ins_out_c = ins_head(grl(feats, w_cst * w_ins))
    loss_cst = F.l1_loss(roi_probs, torch.sigmoid(ins_out_c).reshape(-1))
    return loss_img, loss_ins, loss_cst
