"""Pascal-VOC-style detection evaluation (AP50 with the VOC2010+ all-point
interpolation), covering the reference's VOC datasets (clipart / comic /
watercolor, registered at daod/data/datasets.py:74-85) and its vendored
pascal_voc_evaluator (daod/src/evaluators/pascal_voc_evaluator.py)."""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from .coco_eval import _iou


class PascalVOCEvaluator:
    """method="all_point" (VOC2010+) or "11_point" (VOC2007) — the two
    interpolations the reference's vendored toolkit offers
    (daod/src/utils/enumerators.py MethodAveragePrecision)."""

    def __init__(
        self,
        thing_classes: Sequence[str],
        iou_thresh: float = 0.5,
        method: str = "all_point",
    ):
        self.thing_classes = list(thing_classes)
        self.iou_thresh = iou_thresh
        self.method = method
        self.reset()

    def reset(self):
        self._dets: Dict[int, dict] = {}
        self._gts: Dict[int, dict] = {}

    def process_image(self, image_id, det_boxes, det_scores, det_classes, gt_boxes, gt_classes):
        self._dets[image_id] = {
            "boxes": np.asarray(det_boxes, np.float64).reshape(-1, 4),
            "scores": np.asarray(det_scores, np.float64).reshape(-1),
            "classes": np.asarray(det_classes).reshape(-1),
        }
        self._gts[image_id] = {
            "boxes": np.asarray(gt_boxes, np.float64).reshape(-1, 4),
            "classes": np.asarray(gt_classes).reshape(-1),
        }

    def evaluate(self, return_curves: bool = False) -> dict:
        aps = []
        per_class = {}
        curves = {}
        for c, name in enumerate(self.thing_classes):
            scores, tp_flags, n_gt = [], [], 0
            for img_id, gt in self._gts.items():
                gsel = gt["classes"] == c
                gboxes = gt["boxes"][gsel]
                n_gt += len(gboxes)
                det = self._dets.get(img_id)
                if det is None:
                    continue
                dsel = det["classes"] == c
                dboxes, dscores = det["boxes"][dsel], det["scores"][dsel]
                order = np.argsort(-dscores, kind="stable")
                dboxes, dscores = dboxes[order], dscores[order]
                taken = np.zeros(len(gboxes), bool)
                ious = _iou(dboxes, gboxes) if len(dboxes) and len(gboxes) else None
                for di in range(len(dboxes)):
                    hit = False
                    if ious is not None and len(gboxes):
                        gi = int(np.argmax(np.where(taken, -1.0, ious[di])))
                        if not taken[gi] and ious[di, gi] >= self.iou_thresh:
                            taken[gi] = True
                            hit = True
                    scores.append(dscores[di])
                    tp_flags.append(hit)
            if n_gt == 0:
                continue
            if not scores:
                aps.append(0.0)
                per_class[name] = 0.0
                continue
            order = np.argsort(-np.asarray(scores), kind="stable")
            tp = np.cumsum(np.asarray(tp_flags)[order])
            fp = np.cumsum(~np.asarray(tp_flags)[order])
            rec = tp / n_gt
            prec = tp / np.maximum(tp + fp, 1e-12)
            curves[name] = (rec.copy(), prec.copy())
            if self.method == "11_point":
                # VOC2007 11-point interpolation
                ap = 0.0
                for r in np.linspace(0, 1, 11):
                    above = prec[rec >= r]
                    ap += float(above.max()) if above.size else 0.0
                ap /= 11.0
            else:
                # VOC2010+ all-point interpolation
                mrec = np.concatenate([[0.0], rec, [1.0]])
                mpre = np.concatenate([[0.0], prec, [0.0]])
                for i in range(len(mpre) - 2, -1, -1):
                    mpre[i] = max(mpre[i], mpre[i + 1])
                idx = np.where(mrec[1:] != mrec[:-1])[0]
                ap = float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))
            aps.append(ap)
            per_class[name] = 100 * ap
        out = {
            "VOC_AP50": 100 * float(np.mean(aps)) if aps else float("nan"),
            "voc_per_class": per_class,
        }
        if return_curves:
            out["curves"] = curves
        return out
