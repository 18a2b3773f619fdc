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


# ---------------------------------------------------------------------------
# Reference-exact F1 mode: differential vs a direct numpy transcription of
# daod/evaluation/f1_evaluator.py (count_confusions :101-129, evaluate_output
# :142-174, evaluate :176-230).
# ---------------------------------------------------------------------------


def _oracle_iou_plus1(ev, out):
    ev_areas = (ev[:, 2] - ev[:, 0] + 1) * (ev[:, 3] - ev[:, 1] + 1)
    out_areas = (out[:, 2] - out[:, 0] + 1) * (out[:, 3] - out[:, 1] + 1)
    ious = np.zeros((len(ev), len(out)))
    for i in range(len(ev)):
        xx1 = np.maximum(ev[i, 0], out[:, 0])
        yy1 = np.maximum(ev[i, 1], out[:, 1])
        xx2 = np.minimum(ev[i, 2], out[:, 2])
        yy2 = np.minimum(ev[i, 3], out[:, 3])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ious[i, :] = inter / (ev_areas[i] + out_areas - inter)
    return ious


def _oracle_count_confusions(ev_boxes, out_boxes, iou_thresh):
    ious = _oracle_iou_plus1(ev_boxes, out_boxes)
    ev_trues, out_trues = [], []
    while True:
        ret = np.where((ious > iou_thresh) & (ious == ious.max()))
        if len(ret[0]) == 0:
            break
        ei, oi = ret[0][0], ret[1][0]
        ious[ei, :] = 0
        ious[:, oi] = 0
        ev_trues.append(ei)
        out_trues.append(oi)
    return (
        len(ev_trues),
        sum(1 for i in range(len(out_boxes)) if i not in out_trues),
        sum(1 for i in range(len(ev_boxes)) if i not in ev_trues),
    )


def _oracle_reference_f1(images, class_number, iou=0.5, top_n=5, score=0.5):
    TP = FP = FN = 0
    for det_boxes, det_scores, det_classes, gt_boxes, gt_classes in images:
        b, c = det_boxes, det_classes
        if len(det_boxes) > 0:
            keep = np.where(det_scores >= score)[0]
            b, c, s = det_boxes[keep], det_classes[keep], det_scores[keep]
            keep = np.argsort(s)[::-1][:top_n]
            b, c = b[keep], c[keep]
            b = b.astype(np.int32)
        for cid in range(class_number):
            ek = np.where(gt_classes == cid)[0]
            ok = np.where(c == cid)[0]
            if len(ek) == 0:
                FP += len(ok)
            if len(ok) == 0:
                FN += len(ek)
            if len(ek) > 0 and len(ok) > 0:
                tp, fp, fn = _oracle_count_confusions(
                    gt_boxes[ek].astype(np.float64), b[ok].astype(np.float64), iou
                )
                TP, FP, FN = TP + tp, FP + fp, FN + fn
    prec = TP / (TP + FP) if (TP + FP) else 0
    rec = TP / (TP + FN) if (TP + FN) else 0
    if prec + rec == 0:
        return 0.0, TP, FP, FN
    return 2 * prec * rec / (prec + rec), TP, FP, FN


class TestF1ReferenceMode:
    def _random_image(self, rng, ncls):
        nd = rng.integers(0, 12)
        ng = rng.integers(0, 8)
        def boxes(n):
            xy = rng.uniform(0, 500, (n, 2))
            wh = rng.uniform(1, 120, (n, 2))
            return np.concatenate([xy, xy + wh], 1)
        return (
            boxes(nd),
            rng.uniform(0, 1, nd),
            rng.integers(0, ncls, nd),
            boxes(ng),
            rng.integers(0, ncls, ng),
        )

    def test_fuzz_vs_transcription(self):
        rng = np.random.default_rng(0)
        for trial in range(20):
            ncls = int(rng.integers(1, 5))
            images = [self._random_image(rng, ncls) for _ in range(6)]
            ev = F1Evaluator(mode="reference")
            for img_id, (db, ds, dc, gb, gc) in enumerate(images):
                ev.process_image(img_id, db, ds, dc, gb, gc)
            got = ev.evaluate()
            want_f1, tp, fp, fn = _oracle_reference_f1(images, ncls)
            assert (ev.tp, ev.fp, ev.fn) == (tp, fp, fn), f"trial {trial}"
            assert abs(got["F1"] - want_f1) < 1e-12
            assert got["F1_mode"] == "reference"

    def test_top5_cap_and_int_cast(self):
        # 7 dets above score thresh on one gt: reference counts only top 5,
        # so FP = 4 (5 kept - 1 TP); greedy counts all 7, FP = 6.
        db = np.array([box(0, 0, 10, 10)] * 7, np.float64)
        db[1:] += np.arange(1, 7)[:, None] * 30.0  # move 6 away from the gt
        ds = np.linspace(0.95, 0.6, 7)
        dc = np.zeros(7, int)
        gb, gc = np.array([box(0, 0, 10, 10)]), np.array([0])
        ref = F1Evaluator(mode="reference")
        ref.process_image(1, db, ds, dc, gb, gc)
        assert (ref.tp, ref.fp, ref.fn) == (1, 4, 0)
        gr = F1Evaluator(mode="greedy")
        gr.process_image(1, db, ds, dc, gb, gc)
        assert (gr.tp, gr.fp, gr.fn) == (1, 6, 0)
        # int32 cast: a det at 0.6-pixel offset snaps onto the gt grid
        db2 = np.array([[0.6, 0.6, 10.6, 10.6]])
        ref2 = F1Evaluator(mode="reference")
        ref2.process_image(1, db2, np.array([0.9]), np.array([0]), gb, gc)
        # int cast -> [0,0,10,10]: IoU 1.0 -> TP
        assert (ref2.tp, ref2.fp, ref2.fn) == (1, 0, 0)

    def test_strict_threshold(self):
        # +1 convention: 10x10 box = 11x11 pixels; iou must be STRICTLY > 0.5
        gb, gc = np.array([box(0, 0, 10, 10)], np.float64), np.array([0])
        # det sharing exactly half+eps area via the +1 convention
        db = np.array([[0, 0, 10, 4]], np.float64)  # inter 11*5=55, union 121+55-55=121
        ev = F1Evaluator(mode="reference")
        ev.process_image(1, db, np.array([0.9]), np.array([0]), gb, gc)
        assert ev.tp == 0 and ev.fp == 1 and ev.fn == 1
