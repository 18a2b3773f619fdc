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

    def test_fuzz_vs_voc_eval_transcription(self):
        """Differential vs a direct numpy transcription of detectron2's
        voc_eval (pascal_voc_evaluation.py — py-faster-rcnn lineage): global
        score order, argmax over all gt, strict >, difficult excluded from
        npos / matches ignored, +1 inclusive-pixel arithmetic in VOC coords
        (which the evaluator's continuous IoU in d2 coords equals exactly:
        the -1/+1 shifts cancel). 20 random datasets, per-class AP equality."""

        def voc_eval_ap(dets, gts, cls, ovthresh=0.5):
            # dets: {img: (boxes_d2, scores, classes)}; gts: {img: (boxes_d2,
            # classes, difficult)}. VOC coords: mins +1 (d2 writes xmin+1 /
            # ymin+1; GT raw XML = stored mins +1).
            recs = {}
            npos = 0
            for img, (gb, gc, gd) in gts.items():
                sel = gc == cls
                bbgt = gb[sel] + np.asarray([1.0, 1.0, 0.0, 0.0])
                diff = gd[sel].astype(bool)
                npos += int((~diff).sum())
                recs[img] = {"bbox": bbgt, "difficult": diff, "det": np.zeros(len(bbgt), bool)}
            image_ids, confidence, BB = [], [], []
            for img, (db, ds, dc) in dets.items():
                sel = dc == cls
                for b, s in zip(db[sel], ds[sel]):
                    image_ids.append(img)
                    confidence.append(s)
                    BB.append(b + np.asarray([1.0, 1.0, 0.0, 0.0]))
            if not image_ids:
                return 0.0 if npos else None
            sorted_ind = np.argsort(-np.asarray(confidence))
            BB = np.asarray(BB)[sorted_ind]
            image_ids = [image_ids[i] for i in sorted_ind]
            nd = len(image_ids)
            tp, fp = np.zeros(nd), np.zeros(nd)
            for d in range(nd):
                R = recs[image_ids[d]]
                bb = BB[d]
                ovmax, jmax = -np.inf, -1
                BBGT = R["bbox"]
                if BBGT.size > 0:
                    ixmin = np.maximum(BBGT[:, 0], bb[0])
                    iymin = np.maximum(BBGT[:, 1], bb[1])
                    ixmax = np.minimum(BBGT[:, 2], bb[2])
                    iymax = np.minimum(BBGT[:, 3], bb[3])
                    iw = np.maximum(ixmax - ixmin + 1.0, 0.0)
                    ih = np.maximum(iymax - iymin + 1.0, 0.0)
                    inters = iw * ih
                    uni = (
                        (bb[2] - bb[0] + 1.0) * (bb[3] - bb[1] + 1.0)
                        + (BBGT[:, 2] - BBGT[:, 0] + 1.0) * (BBGT[:, 3] - BBGT[:, 1] + 1.0)
                        - inters
                    )
                    overlaps = inters / uni
                    ovmax = np.max(overlaps)
                    jmax = int(np.argmax(overlaps))
                if ovmax > ovthresh:
                    if not R["difficult"][jmax]:
                        if not R["det"][jmax]:
                            tp[d] = 1.0
                            R["det"][jmax] = True
                        else:
                            fp[d] = 1.0
                else:
                    fp[d] = 1.0
            if npos == 0:
                return None
            rec = np.cumsum(tp) / float(npos)
            prec = np.cumsum(tp) / np.maximum(np.cumsum(tp) + np.cumsum(fp), np.finfo(np.float64).eps)
            mrec = np.concatenate(([0.0], rec, [1.0]))
            mpre = np.concatenate(([0.0], prec, [0.0]))
            for i in range(mpre.size - 1, 0, -1):
                mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
            i = np.where(mrec[1:] != mrec[:-1])[0]
            return float(np.sum((mrec[i + 1] - mrec[i]) * mpre[i + 1]))

        rs = np.random.RandomState(11)
        C = 3
        for trial in range(20):
            n_img = rs.randint(2, 6)
            dets, gts = {}, {}
            ev = PascalVOCEvaluator([f"c{i}" for i in range(C)])
            for img in range(n_img):
                ng, nd = rs.randint(1, 6), rs.randint(0, 8)
                gx = rs.randint(0, 200, (ng, 2)).astype(np.float64)
                gwh = rs.randint(5, 80, (ng, 2)).astype(np.float64)
                gb = np.concatenate([gx, gx + gwh], axis=1)
                gc = rs.randint(0, C, ng)
                gd = (rs.uniform(size=ng) < 0.25).astype(int)
                dx = rs.randint(0, 200, (nd, 2)).astype(np.float64)
                dwh = rs.randint(5, 80, (nd, 2)).astype(np.float64)
                # half the detections jitter off real GT for plausible IoUs
                for k in range(0, nd, 2):
                    gi = rs.randint(ng)
                    dx[k] = gx[gi] + rs.randint(-8, 9, 2)
                    dwh[k] = gwh[gi] + rs.randint(-8, 9, 2).clip(-gwh[gi].min() + 3, None)
                db = np.concatenate([dx, dx + np.maximum(dwh, 1)], axis=1)
                ds = rs.uniform(0.05, 1.0, nd)
                dc = rs.randint(0, C, nd)
                dets[img] = (db, ds, dc)
                gts[img] = (gb, gc, gd)
                ev.process_image(img, db, ds, dc, gb, gc, gt_difficult=gd)
            res = ev.evaluate()
            for c in range(C):
                ref_ap = voc_eval_ap(dets, gts, c)
                ours = res["voc_per_class"].get(f"c{c}")
                if ref_ap is None:
                    assert ours is None, (trial, c)
                elif ours is None:
                    # evaluator skips zero-GT classes; transcription returns
                    # 0.0 there only when npos>0, so this cannot happen
                    raise AssertionError((trial, c))
                else:
                    np.testing.assert_allclose(ours, 100 * ref_ap, atol=1e-9, err_msg=f"trial {trial} class {c}")

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
