"""Dataset-level F1 @ IoU 0.5 (reference daod/evaluation/f1_evaluator.py:
greedy IoU matching per image :101-129, dataset precision/recall/F1 :176-230).
"""

from __future__ import annotations


import numpy as np

from .coco_eval import _iou


class F1Evaluator:
    def __init__(self, iou_thresh: float = 0.5, score_thresh: float = 0.5):
        self.iou_thresh = iou_thresh
        self.score_thresh = score_thresh
        self.reset()

    def reset(self):
        self.tp = 0
        self.fp = 0
        self.fn = 0

    def process_image(self, image_id, det_boxes, det_scores, det_classes, gt_boxes, gt_classes):
        det_boxes = np.asarray(det_boxes, np.float64).reshape(-1, 4)
        det_scores = np.asarray(det_scores, np.float64)
        det_classes = np.asarray(det_classes)
        gt_boxes = np.asarray(gt_boxes, np.float64).reshape(-1, 4)
        gt_classes = np.asarray(gt_classes)

        keep = det_scores >= self.score_thresh
        det_boxes, det_classes = det_boxes[keep], det_classes[keep]
        det_scores = det_scores[keep]
        order = np.argsort(-det_scores, kind="stable")
        det_boxes, det_classes = det_boxes[order], det_classes[order]

        g = len(gt_boxes)
        taken = np.zeros(g, bool)
        tp = 0
        if len(det_boxes) and g:
            ious = _iou(det_boxes, gt_boxes)
            for di in range(len(det_boxes)):
                best, best_iou = -1, self.iou_thresh
                for gi in range(g):
                    if taken[gi] or gt_classes[gi] != det_classes[di]:
                        continue
                    if ious[di, gi] >= best_iou:
                        best, best_iou = gi, ious[di, gi]
                if best >= 0:
                    taken[best] = True
                    tp += 1
        self.tp += tp
        self.fp += len(det_boxes) - tp
        self.fn += g - tp

    def evaluate(self) -> dict:
        prec = self.tp / max(self.tp + self.fp, 1)
        rec = self.tp / max(self.tp + self.fn, 1)
        f1 = 2 * prec * rec / max(prec + rec, 1e-12)
        return {"precision": prec, "recall": rec, "F1": f1}
