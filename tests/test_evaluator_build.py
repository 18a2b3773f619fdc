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
