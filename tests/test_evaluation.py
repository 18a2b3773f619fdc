"""Hand-computed golden tests for the from-scratch COCO mAP, F1, DECE."""

import numpy as np

from simple_sfod_tpu.evaluation.coco_eval import COCOEvaluator, coco_map
from simple_sfod_tpu.evaluation.f1 import F1Evaluator
from simple_sfod_tpu.evaluation.dece import DECEEvaluator


def box(x, y, w, h):
    return [x, y, x + w, y + h]


class TestCocoMap:
    def test_perfect_detection(self):
        gts = {1: {"boxes": np.array([box(10, 10, 50, 50)]), "classes": np.array([0])}}
        dets = {
            1: {
                "boxes": np.array([box(10, 10, 50, 50)]),
                "scores": np.array([0.9]),
                "classes": np.array([0]),
            }
        }
        res = coco_map(dets, gts, num_classes=1)
        assert abs(res["AP"] - 100.0) < 1e-6
        assert abs(res["AP50"] - 100.0) < 1e-6

    def test_half_iou_detection(self):
        # IoU = 0.5 exactly: matched at thr .50 only if iou >= thr
        gts = {1: {"boxes": np.array([box(0, 0, 10, 10)]), "classes": np.array([0])}}
        dets = {
            1: {
                "boxes": np.array([box(0, 0, 10, 20)]),  # iou = 100/200 = 0.5
                "scores": np.array([0.9]),
                "classes": np.array([0]),
            }
        }
        res = coco_map(dets, gts, num_classes=1)
        assert abs(res["AP50"] - 100.0) < 1e-6  # matched at 0.5
        assert abs(res["AP75"] - 0.0) < 1e-6

    def test_fp_before_tp(self):
        # higher-scored FP then TP: precision at recall 1 is 0.5
        gts = {1: {"boxes": np.array([box(0, 0, 10, 10)]), "classes": np.array([0])}}
        dets = {
            1: {
                "boxes": np.array([box(50, 50, 10, 10), box(0, 0, 10, 10)]),
                "scores": np.array([0.95, 0.9]),
                "classes": np.array([0, 0]),
            }
        }
        res = coco_map(dets, gts, num_classes=1)
        # 101-pt interp: precision 0.5 across all recall points
        assert abs(res["AP50"] - 50.0) < 1.0

    def test_class_never_predicted(self):
        gts = {
            1: {
                "boxes": np.array([box(0, 0, 10, 10), box(30, 30, 10, 10)]),
                "classes": np.array([0, 1]),
            }
        }
        dets = {
            1: {
                "boxes": np.array([box(0, 0, 10, 10)]),
                "scores": np.array([0.9]),
                "classes": np.array([0]),
            }
        }
        res = coco_map(dets, gts, num_classes=2)
        assert abs(res["per_class_AP50"][0] - 100.0) < 1e-6
        assert res["per_class_AP50"][1] == 0.0
        assert abs(res["AP50"] - 50.0) < 1e-6

    def test_absent_class_excluded_from_mean(self):
        gts = {1: {"boxes": np.array([box(0, 0, 10, 10)]), "classes": np.array([0])}}
        dets = {1: {"boxes": np.array([box(0, 0, 10, 10)]), "scores": np.array([0.9]), "classes": np.array([0])}}
        res = coco_map(dets, gts, num_classes=3)  # classes 1,2 have no GT
        assert abs(res["AP50"] - 100.0) < 1e-6

    def test_duplicate_detections_are_fp(self):
        gts = {1: {"boxes": np.array([box(0, 0, 10, 10)]), "classes": np.array([0])}}
        dets = {
            1: {
                "boxes": np.array([box(0, 0, 10, 10), box(0, 0, 10, 10)]),
                "scores": np.array([0.9, 0.8]),
                "classes": np.array([0, 0]),
            }
        }
        res = coco_map(dets, gts, num_classes=1)
        assert abs(res["AP50"] - 100.0) < 1e-6  # dup is FP after recall 1


class TestRemap:
    def test_car_only_remap(self):
        ev = COCOEvaluator(["car"], class_remap={2: 0, 5: -1})
        ev.process_image(
            1,
            np.array([box(0, 0, 10, 10), box(30, 30, 5, 5)]),
            np.array([0.9, 0.8]),
            np.array([2, 5]),  # car-family remapped, class 5 dropped
            np.array([box(0, 0, 10, 10)]),
            np.array([0]),
        )
        res = ev.evaluate()
        assert abs(res["AP50"] - 100.0) < 1e-6


class TestF1:
    def test_counts(self):
        ev = F1Evaluator(iou_thresh=0.5, score_thresh=0.5)
        ev.process_image(
            1,
            np.array([box(0, 0, 10, 10), box(50, 50, 10, 10)]),
            np.array([0.9, 0.8]),
            np.array([0, 0]),
            np.array([box(0, 0, 10, 10), box(100, 100, 10, 10)]),
            np.array([0, 0]),
        )
        res = ev.evaluate()
        assert ev.tp == 1 and ev.fp == 1 and ev.fn == 1
        assert abs(res["F1"] - 0.5) < 1e-9

    def test_class_mismatch_not_matched(self):
        ev = F1Evaluator()
        ev.process_image(
            1,
            np.array([box(0, 0, 10, 10)]),
            np.array([0.9]),
            np.array([1]),
            np.array([box(0, 0, 10, 10)]),
            np.array([0]),
        )
        assert ev.tp == 0 and ev.fp == 1 and ev.fn == 1


class TestDECE:
    def test_perfectly_calibrated_wrong(self):
        ev = DECEEvaluator(bins=10)
        # one hit at conf .95, one miss at conf .95 -> bin acc 0.5, conf .95
        ev.process_image(
            1,
            np.array([box(0, 0, 10, 10), box(50, 50, 10, 10)]),
            np.array([0.95, 0.95]),
            np.array([0, 0]),
            np.array([box(0, 0, 10, 10)]),
            np.array([0]),
        )
        res = ev.evaluate()
        assert abs(res["DECE"] - 0.45) < 1e-9
