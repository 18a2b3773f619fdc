"""Golden tests for the spatio-temporal tube evaluator (evaluation/tube.py).

Hand-computed STT-IoU / AP values for a 2-class, 2-video case, mirroring
the reference's dead-code tube evaluator semantics
(daod/src/evaluators/tube_evaluator.py, daod/src/tube.py).
"""

import json

import numpy as np
import pytest

from simple_sfod_tpu.evaluation.tube import Tube, TubeEvaluator, evaluate_tubes, stt_iou


def _track(frames, xywh, conf=None):
    out = []
    for i, f in enumerate(frames):
        t = {"frame": f, "bbox": list(xywh[i] if isinstance(xywh[0], (list, tuple)) else xywh)}
        if conf is not None:
            t["confidence"] = conf
        out.append(t)
    return out


# class 1 ("car"), video 1: GT A = 3 frames of [0,0,10,10]
GT_A = dict(category_id=1, video_id=1, track=_track([0, 1, 2], [0, 0, 10, 10]))
# class 1, video 1: GT C = 2 frames of [20,0,10,10]
GT_C = dict(category_id=1, video_id=1, track=_track([0, 1], [20, 0, 10, 10]))
# class 2 ("person"): one GT per video
GT_B = dict(category_id=2, video_id=1, track=_track([0, 1], [0, 0, 4, 4]))
GT_D = dict(category_id=2, video_id=2, track=_track([0], [0, 0, 4, 4]))

# predictions: P1 exact match of A (conf .9); P2 half-overlaps A (conf .8, FP);
# P3 overlaps C at IoU 2/3 (conf .7); Q1 exact match of B (conf .5);
# Q2 overlaps D at IoU 1/3 (conf .9, FP)
P1 = dict(category_id=1, video_id=1, track=_track([0, 1, 2], [0, 0, 10, 10], conf=0.9))
P2 = dict(category_id=1, video_id=1, track=_track([0, 1], [5, 0, 10, 10], conf=0.8))
P3 = dict(category_id=1, video_id=1, track=_track([0, 1], [22, 0, 10, 10], conf=0.7))
Q1 = dict(category_id=2, video_id=1, track=_track([0, 1], [0, 0, 4, 4], conf=0.5))
Q2 = dict(category_id=2, video_id=2, track=_track([0], [2, 0, 4, 4], conf=0.9))

VIDEOS = [{"id": 1}, {"id": 2}]
CATEGORIES = [{"id": 1, "name": "car"}, {"id": 2, "name": "person"}]


def test_tube_volume_and_confidence():
    t = Tube(**P1)
    assert t.volume == 300.0  # 3 frames x 100 px
    assert t.confidence == pytest.approx(0.9)
    # boxes stored xyxy
    np.testing.assert_allclose(t.frame_box(0), [0, 0, 10, 10])


def test_stt_iou_hand_values():
    # P3 vs C: per-frame inter 8*10=80 over 2 frames -> I=160; union 200+200-160
    assert stt_iou(Tube(**P3), Tube(**GT_C)) == pytest.approx(160.0 / 240.0)
    # P2 vs A: per-frame inter 5*10=50 over 2 common frames -> I=100; union 300+200-100
    assert stt_iou(Tube(**P2), Tube(**GT_A)) == pytest.approx(100.0 / 400.0)
    # disjoint frames -> 0
    far = Tube(category_id=1, video_id=1, track=_track([7], [0, 0, 10, 10]))
    assert stt_iou(far, Tube(**GT_A)) == 0.0


def test_evaluate_tubes_all_point():
    gts = [Tube(**d) for d in (GT_A, GT_C, GT_B, GT_D)]
    preds = [Tube(**d) for d in (P1, P2, P3, Q1, Q2)]
    res, mAP = evaluate_tubes(gts, preds, VIDEOS, CATEGORIES, thr=0.5)
    # car: sorted [P1 tp, P2 fp, P3 tp], n_gt 2 -> AP = 0.5*1 + 0.5*(2/3) = 5/6
    assert res["car"]["AP"] == pytest.approx(5.0 / 6.0)
    assert (res["car"]["total TP"], res["car"]["total FP"], res["car"]["total FN"]) == (2, 1, 0)
    # person: sorted [Q2 fp, Q1 tp], n_gt 2 -> AP = 0.25
    assert res["person"]["AP"] == pytest.approx(0.25)
    assert (res["person"]["total TP"], res["person"]["total FP"], res["person"]["total FN"]) == (
        1,
        1,
        1,
    )
    assert mAP == pytest.approx((5.0 / 6.0 + 0.25) / 2.0)


def test_evaluate_tubes_11_point():
    gts = [Tube(**d) for d in (GT_A, GT_C)]
    preds = [Tube(**d) for d in (P1, P2, P3)]
    res, mAP = evaluate_tubes(gts, preds, VIDEOS, CATEGORIES[:1], thr=0.5, method="11_point")
    # 11-point: 6 recall points see prec 1.0, 5 see 2/3 -> 28/33
    assert res["car"]["AP"] == pytest.approx(28.0 / 33.0)


def test_file_based_evaluator(tmp_path):
    anno = {
        "videos": VIDEOS,
        "categories": CATEGORIES,
        "annotations": [GT_A, GT_C, GT_B, GT_D],
    }
    anno_p = tmp_path / "anno.json"
    preds_p = tmp_path / "preds.json"
    anno_p.write_text(json.dumps(anno))
    preds_p.write_text(json.dumps([P1, P2, P3, Q1, Q2]))
    res, mAP = TubeEvaluator(str(anno_p), str(preds_p)).evaluate(thr=0.5)
    assert mAP == pytest.approx((5.0 / 6.0 + 0.25) / 2.0)
    with pytest.raises(ValueError):
        TubeEvaluator("anno.txt", str(preds_p))
    with pytest.raises(ValueError):
        TubeEvaluator(str(anno_p), str(preds_p)).evaluate(thr=0.0)


def test_greedy_matching_prefers_best_covered_gt():
    # one pred overlapping two gts: it must match the better-covered one
    gt_hi = dict(category_id=1, video_id=1, track=_track([0], [0, 0, 10, 10]))
    gt_lo = dict(category_id=1, video_id=1, track=_track([0], [6, 0, 10, 10]))
    pred = dict(category_id=1, video_id=1, track=_track([0], [1, 0, 10, 10], conf=0.9))
    res, _ = evaluate_tubes(
        [Tube(**gt_hi), Tube(**gt_lo)], [Tube(**pred)], [{"id": 1}], CATEGORIES[:1], thr=0.5
    )
    assert res["car"]["total TP"] == 1  # matched gt_hi at IoU 9/11 >= .5
    assert res["car"]["total FN"] == 1  # gt_lo left undetected
