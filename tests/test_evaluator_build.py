"""Evaluator selection (reference base.py:125-161) + VOC evaluator math."""

import numpy as np

from simple_sfod_tpu.config import get_cfg
from simple_sfod_tpu.evaluation.build import build_evaluators, CAR_ONLY_REMAP
from simple_sfod_tpu.evaluation.coco_eval import COCOEvaluator
from simple_sfod_tpu.evaluation.voc import PascalVOCEvaluator


def box(x, y, w, h):
    return [x, y, x + w, y + h]


class TestBuildEvaluators:
    def test_cityscapes_gets_coco(self):
        cfg = get_cfg()
        evs = build_evaluators(cfg, "cityscapes_instancesonly_foggy_val_foggy_beta_0.02", ["a"] * 8)
        assert isinstance(evs[0], COCOEvaluator)
        assert evs[0].class_remap is None

    def test_car_only_gets_remap(self):
        cfg = get_cfg()
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 8
        evs = build_evaluators(cfg, "cityscapes_car_val", ["car"])
        assert isinstance(evs[0], COCOEvaluator)
        assert evs[0].class_remap == CAR_ONLY_REMAP

    def test_voc_datasets_get_voc(self):
        cfg = get_cfg()
        evs = build_evaluators(cfg, "clipart_test", ["a", "b"])
        assert isinstance(evs[0], PascalVOCEvaluator)


class TestVOC:
    def test_perfect_ap(self):
        ev = PascalVOCEvaluator(["c0"])
        ev.process_image(
            1,
            np.array([box(0, 0, 10, 10)]),
            np.array([0.9]),
            np.array([0]),
            np.array([box(0, 0, 10, 10)]),
            np.array([0]),
        )
        res = ev.evaluate()
        assert abs(res["VOC_AP50"] - 100.0) < 1e-6

    def test_fp_halves_ap(self):
        ev = PascalVOCEvaluator(["c0"])
        ev.process_image(
            1,
            np.array([box(50, 50, 10, 10), box(0, 0, 10, 10)]),
            np.array([0.95, 0.9]),
            np.array([0, 0]),
            np.array([box(0, 0, 10, 10)]),
            np.array([0]),
        )
        res = ev.evaluate()
        # all-point interp: AP = precision at full recall = 0.5
        assert abs(res["VOC_AP50"] - 50.0) < 1e-6

    def test_d2_difficult_excluded_and_ignored(self):
        """d2 voc_eval: difficult GT are out of the AP denominator and a
        detection matched to one is NEITHER TP nor FP (voc_eval's tp/fp
        arrays stay 0 for it)."""
        ev = PascalVOCEvaluator(["c0"])
        ev.process_image(
            1,
            # det A hits the difficult GT (ignored), det B hits the easy GT
            np.array([box(50, 50, 10, 10), box(0, 0, 10, 10)]),
            np.array([0.95, 0.9]),
            np.array([0, 0]),
            np.array([box(50, 50, 10, 10), box(0, 0, 10, 10)]),
            np.array([0, 0]),
            gt_difficult=np.array([1, 0]),
        )
        res = ev.evaluate()
        # 1 TP over npos=1, the ignored det contributes nothing -> AP 100
        assert abs(res["VOC_AP50"] - 100.0) < 1e-6
        # toolkit protocol has no difficult handling: det A is a plain TP
        # against npos=2 with det B the second TP -> also AP 100, but via
        # 2 TPs — distinguish with a miss on the difficult GT instead
        ev2 = PascalVOCEvaluator(["c0"], protocol="toolkit")
        ev2.process_image(
            1,
            np.array([box(0, 0, 10, 10)]),
            np.array([0.9]),
            np.array([0]),
            np.array([box(50, 50, 10, 10), box(0, 0, 10, 10)]),
            np.array([0, 0]),
            gt_difficult=np.array([1, 0]),
        )
        # toolkit counts the unmatched difficult GT in the denominator:
        # recall tops out at 1/2 -> all-point AP = 0.5
        assert abs(ev2.evaluate()["VOC_AP50"] - 50.0) < 1e-6
        # d2 protocol on the same input: npos=1, one TP -> 100
        ev3 = PascalVOCEvaluator(["c0"])
        ev3.process_image(
            1,
            np.array([box(0, 0, 10, 10)]),
            np.array([0.9]),
            np.array([0]),
            np.array([box(50, 50, 10, 10), box(0, 0, 10, 10)]),
            np.array([0, 0]),
            gt_difficult=np.array([1, 0]),
        )
        assert abs(ev3.evaluate()["VOC_AP50"] - 100.0) < 1e-6

    def test_d2_double_match_is_fp(self):
        """voc_eval matches by max IoU over ALL gt; a second detection whose
        best gt is already taken is a FP even if another free gt overlaps."""
        ev = PascalVOCEvaluator(["c0"])
        # det2's best gt is gt0 (IoU 0.905, taken by det1) while free gt1
        # still overlaps det2 at 0.739 > thresh — voc_eval calls det2 a FP;
        # a greedy-skip-taken matcher would have called it a TP on gt1
        ev.process_image(
            1,
            np.array([[0, 0, 10, 10], [0.5, 0, 10.5, 10]]),
            np.array([0.95, 0.9]),
            np.array([0, 0]),
            np.array([[0, 0, 10, 10], [2, 0, 12, 10]]),
            np.array([0, 0]),
        )
        res = ev.evaluate()
        # TP then FP; recall 1/2; all-point AP = 0.5
        assert abs(res["VOC_AP50"] - 50.0) < 1e-6

    def test_difficult_map_constructor_path(self):
        """build.py hands flags via difficult_map when process_image GT
        carries none (the fixed-capacity eval batches)."""
        ev = PascalVOCEvaluator(["c0"], difficult_map={1: [1, 0]})
        ev.process_image(
            1,
            np.array([box(0, 0, 10, 10)]),
            np.array([0.9]),
            np.array([0]),
            np.array([box(50, 50, 10, 10), box(0, 0, 10, 10)]),
            np.array([0, 0]),
        )
        assert abs(ev.evaluate()["VOC_AP50"] - 100.0) < 1e-6
