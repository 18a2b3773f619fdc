"""Pedantic COCOeval re-implementation for differential testing.

Implements the published COCO evaluation algorithm (the one pycocotools'
COCOeval computes) directly from its definition, INCLUDING the area-range
ignore semantics the production evaluator simplifies:

  - per (image, category): detections sorted by score, truncated to maxDets;
    GT outside the area range are IGNORED, not removed — an ignored GT can
    still absorb a detection (which is then ignored), and unmatched
    detections outside the area range are ignored as well;
  - greedy matching at each IoU threshold: a detection takes the unmatched
    GT with the highest IoU >= threshold, preferring non-ignored GT (the
    scan stops at the first ignored GT once a non-ignored match is held);
  - accumulation: all detections of a category sorted by score across
    images; precision envelope; 101-point interpolated AP; recall denominator
    counts only non-ignored GT.

pycocotools is not installed on this machine (and is deliberately not a
dependency), so this file is the independent oracle: it shares no code with
simple_sfod_tpu/evaluation/coco_eval.py or native/cocoeval.cpp.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
RECALL_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}


def _iou_xyxy(d, g):
    lt = np.maximum(d[:, None, :2], g[None, :, :2])
    rb = np.minimum(d[:, None, 2:], g[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    ad = (d[:, 2] - d[:, 0]) * (d[:, 3] - d[:, 1])
    ag = (g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1])
    union = ad[:, None] + ag[None, :] - inter
    return np.where(union > 0, inter / np.where(union > 0, union, 1), 0.0)


def _evaluate_img(dboxes, dscores, gboxes, amin, amax, max_dets):
    """One (image, category, area-range) evaluation.

    Returns (dt_scores_sorted, dt_matched [T, D], dt_ignored [T, D], npig).
    """
    t = len(IOU_THRS)
    order = np.argsort(-dscores, kind="stable")[:max_dets]
    dboxes, dscores = dboxes[order], dscores[order]
    d, g = len(dboxes), len(gboxes)
    gareas = (
        (gboxes[:, 2] - gboxes[:, 0]) * (gboxes[:, 3] - gboxes[:, 1])
        if g
        else np.zeros(0)
    )
    gt_ig = ~((gareas >= amin) & (gareas < amax))
    # sort GT so non-ignored come first (pycocotools gtind = argsort(ignore))
    gind = np.argsort(gt_ig, kind="stable")
    gboxes, gt_ig = gboxes[gind], gt_ig[gind]

    dtm = -np.ones((t, d), np.int64)
    dt_ig = np.zeros((t, d), bool)
    if d and g:
        ious = _iou_xyxy(dboxes, gboxes)
        for ti, thr in enumerate(IOU_THRS):
            gtm = -np.ones(g, np.int64)
            for di in range(d):
                best_iou = min(thr, 1 - 1e-10)
                m = -1
                for gi in range(g):
                    if gtm[gi] >= 0:
                        continue
                    # holding a non-ignored match and reaching ignored GT:
                    # stop (ignored GT sort last)
                    if m > -1 and not gt_ig[m] and gt_ig[gi]:
                        break
                    if ious[di, gi] < best_iou:
                        continue
                    best_iou = ious[di, gi]
                    m = gi
                if m == -1:
                    continue
                dtm[ti, di] = m
                dt_ig[ti, di] = gt_ig[m]
                gtm[m] = di
    # unmatched detections outside the area range are ignored
    if d:
        dareas = (dboxes[:, 2] - dboxes[:, 0]) * (dboxes[:, 3] - dboxes[:, 1])
        d_out = ~((dareas >= amin) & (dareas < amax))
        dt_ig |= (dtm == -1) & d_out[None, :]
    npig = int((~gt_ig).sum())
    return dscores, dtm >= 0, dt_ig, npig


def pedantic_coco_map(
    detections: Dict[int, dict],
    ground_truth: Dict[int, dict],
    num_classes: int,
    max_dets: int = 100,
) -> dict:
    t = len(IOU_THRS)
    out = {}
    per_class_ap = np.full(num_classes, np.nan)
    per_class_ap50 = np.full(num_classes, np.nan)
    per_class_ap75 = np.full(num_classes, np.nan)
    image_ids = sorted(ground_truth.keys())
    for area_name, (amin, amax) in AREA_RANGES.items():
        aps = np.full((t, num_classes), np.nan)
        for c in range(num_classes):
            scores, matched, ignored, npig = [], [], [], 0
            for img_id in image_ids:
                gt = ground_truth[img_id]
                gsel = np.asarray(gt["classes"]) == c
                gboxes = np.asarray(gt["boxes"], np.float64).reshape(-1, 4)[gsel]
                det = detections.get(img_id, {"boxes": [], "scores": [], "classes": []})
                dsel = np.asarray(det["classes"]) == c
                dboxes = np.asarray(det["boxes"], np.float64).reshape(-1, 4)[dsel]
                dscores = np.asarray(det["scores"], np.float64)[dsel]
                s, m, ig, n = _evaluate_img(dboxes, dscores, gboxes, amin, amax, max_dets)
                scores.append(s)
                matched.append(m)
                ignored.append(ig)
                npig += n
            if npig == 0:
                continue
            scores = np.concatenate(scores)
            matched = np.concatenate(matched, axis=1)
            ignored = np.concatenate(ignored, axis=1)
            order = np.argsort(-scores, kind="stable")
            matched, ignored = matched[:, order], ignored[:, order]
            tps = np.cumsum(matched & ~ignored, axis=1).astype(np.float64)
            fps = np.cumsum(~matched & ~ignored, axis=1).astype(np.float64)
            for ti in range(t):
                rc = tps[ti] / npig
                pr = tps[ti] / np.maximum(tps[ti] + fps[ti], np.spacing(1))
                pr = pr.copy()
                for i in range(len(pr) - 1, 0, -1):
                    pr[i - 1] = max(pr[i - 1], pr[i])
                inds = np.searchsorted(rc, RECALL_THRS, side="left")
                q = np.zeros(len(RECALL_THRS))
                ok = inds < len(pr)
                q[ok] = pr[inds[ok]]
                aps[ti, c] = q.mean()
        mean_ap = (
            float(np.nanmean(aps)) if not np.all(np.isnan(aps)) else float("nan")
        )
        out[area_name] = 100 * mean_ap
        if area_name == "all":
            with np.errstate(invalid="ignore"):
                per_class_ap = 100 * np.nanmean(aps, axis=0)
            per_class_ap50 = 100 * aps[0]
            per_class_ap75 = 100 * aps[5]
            out["AP50"] = (
                100 * float(np.nanmean(aps[0])) if not np.all(np.isnan(aps[0])) else float("nan")
            )
            out["AP75"] = (
                100 * float(np.nanmean(aps[5])) if not np.all(np.isnan(aps[5])) else float("nan")
            )
    return {
        "AP": out["all"],
        "AP50": out["AP50"],
        "AP75": out["AP75"],
        "APs": out["small"],
        "APm": out["medium"],
        "APl": out["large"],
        "per_class_AP": per_class_ap.tolist(),
        "per_class_AP50": per_class_ap50.tolist(),
    }
