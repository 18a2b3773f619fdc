"""Slow, obviously-correct numpy reference implementations used as golden
oracles for the TPU kernels (the reference repo leaned on torchvision /
detectron2 CUDA kernels for these; we re-derive them from first principles)."""

from __future__ import annotations

import numpy as np


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    n, m = len(a), len(b)
    out = np.zeros((n, m), np.float64)
    for i in range(n):
        for j in range(m):
            xx1 = max(a[i, 0], b[j, 0])
            yy1 = max(a[i, 1], b[j, 1])
            xx2 = min(a[i, 2], b[j, 2])
            yy2 = min(a[i, 3], b[j, 3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            a1 = (a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
            a2 = (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1])
            union = a1 + a2 - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def _iou_fast(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    a2 = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = a1[:, None] + a2[None, :] - inter
    return np.where(union > 0, inter / np.where(union > 0, union, 1), 0.0)


def greedy_nms(boxes: np.ndarray, scores: np.ndarray, thr: float) -> np.ndarray:
    """Classic sequential NMS. Returns kept indices in score order.

    Ties in score break by lower index first (stable sort), matching
    torchvision's sort-then-scan convention.
    """
    order = np.argsort(-scores, kind="stable")
    sboxes = boxes[order]
    iou = _iou_fast(sboxes, sboxes)
    n = len(boxes)
    suppressed = np.zeros(n, bool)
    keep = []
    for i in range(n):
        if suppressed[i]:
            continue
        keep.append(order[i])
        suppressed |= iou[i] > thr
        suppressed[i] = False
    return np.asarray(keep, np.int64)


def roi_align_ref(
    feat: np.ndarray,
    rois: np.ndarray,
    spatial_scale: float,
    out: int,
    sampling_ratio: int,
    aligned: bool = True,
) -> np.ndarray:
    """Direct port of the ROIAlign math (torchvision semantics). feat [H,W,C]."""
    h, w, c = feat.shape
    res = np.zeros((len(rois), out, out, c), np.float64)
    off = 0.5 if aligned else 0.0
    for r, roi in enumerate(rois):
        x1 = roi[0] * spatial_scale - off
        y1 = roi[1] * spatial_scale - off
        x2 = roi[2] * spatial_scale - off
        y2 = roi[3] * spatial_scale - off
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / out, rh / out
        for i in range(out):
            for j in range(out):
                acc = np.zeros(c, np.float64)
                for iy in range(sampling_ratio):
                    for ix in range(sampling_ratio):
                        y = y1 + (i + (iy + 0.5) / sampling_ratio) * bh
                        x = x1 + (j + (ix + 0.5) / sampling_ratio) * bw
                        if y < -1.0 or y > h or x < -1.0 or x > w:
                            continue
                        y_, x_ = min(max(y, 0.0), h - 1), min(max(x, 0.0), w - 1)
                        y0, x0 = int(np.floor(y_)), int(np.floor(x_))
                        y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                        ly, lx = y_ - y0, x_ - x0
                        acc += (
                            feat[y0, x0] * (1 - ly) * (1 - lx)
                            + feat[y0, x1i] * (1 - ly) * lx
                            + feat[y1i, x0] * ly * (1 - lx)
                            + feat[y1i, x1i] * ly * lx
                        )
                res[r, i, j] = acc / (sampling_ratio * sampling_ratio)
    return res
