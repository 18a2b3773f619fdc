"""Standalone metrics tool (reference vendored toolkit + GUI capability,
SURVEY §2.1 #40): the same scene encoded in every supported annotation
format must produce identical metrics."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from simple_sfod_tpu.evaluation.toolkit import (
    ClassTable,
    load_detections,
    load_ground_truth,
)

# one scene: 2 images, 2 classes
GT = {
    "img1": {"boxes": [[10, 10, 50, 50], [60, 20, 100, 80]], "classes": [0, 1]},
    "img2": {"boxes": [[5, 5, 25, 45]], "classes": [0]},
}
DETS = {
    "img1": {
        "boxes": [[12, 11, 52, 49], [61, 22, 99, 78], [0, 0, 8, 8]],
        "classes": [0, 1, 0],
        "scores": [0.9, 0.8, 0.3],
    },
    "img2": {"boxes": [[6, 6, 24, 44]], "classes": [0], "scores": [0.7]},
}
NAMES = ["person", "car"]
IMG_SIZE = (128, 96)  # (w, h)


def _write_coco(tmp, gts, dets):
    gt_json = {
        "images": [
            {"id": k, "width": IMG_SIZE[0], "height": IMG_SIZE[1]} for k in gts
        ],
        "categories": [{"id": i + 1, "name": n} for i, n in enumerate(NAMES)],
        "annotations": [],
    }
    aid = 1
    for img_id, rec in gts.items():
        for b, c in zip(rec["boxes"], rec["classes"]):
            gt_json["annotations"].append(
                {
                    "id": aid,
                    "image_id": img_id,
                    "category_id": c + 1,
                    "bbox": [b[0], b[1], b[2] - b[0], b[3] - b[1]],
                    "area": (b[2] - b[0]) * (b[3] - b[1]),
                    "iscrowd": 0,
                }
            )
            aid += 1
    det_json = []
    for img_id, rec in dets.items():
        for b, c, s in zip(rec["boxes"], rec["classes"], rec["scores"]):
            det_json.append(
                {
                    "image_id": img_id,
                    "category_id": c + 1,
                    "bbox": [b[0], b[1], b[2] - b[0], b[3] - b[1]],
                    "score": s,
                }
            )
    gt_path = str(tmp / "gt.json")
    det_path = str(tmp / "det.json")
    json.dump(gt_json, open(gt_path, "w"))
    json.dump(det_json, open(det_path, "w"))
    return gt_path, det_path


def _write_voc(tmp, gts):
    d = tmp / "voc"
    d.mkdir()
    for img_id, rec in gts.items():
        objs = "".join(
            f"<object><name>{NAMES[c]}</name><bndbox>"
            f"<xmin>{b[0]}</xmin><ymin>{b[1]}</ymin>"
            f"<xmax>{b[2]}</xmax><ymax>{b[3]}</ymax></bndbox></object>"
            for b, c in zip(rec["boxes"], rec["classes"])
        )
        (d / f"{img_id}.xml").write_text(
            f"<annotation><size><width>{IMG_SIZE[0]}</width>"
            f"<height>{IMG_SIZE[1]}</height></size>{objs}</annotation>"
        )
    return str(d)


def _write_txt(tmp, recs, fmt, detections, name):
    d = tmp / name
    d.mkdir()
    w, h = IMG_SIZE
    for img_id, rec in recs.items():
        lines = []
        for i, (b, c) in enumerate(zip(rec["boxes"], rec["classes"])):
            conf = f" {rec['scores'][i]}" if detections else ""
            if fmt == "yolo":
                xc, yc = (b[0] + b[2]) / 2 / w, (b[1] + b[3]) / 2 / h
                bw, bh = (b[2] - b[0]) / w, (b[3] - b[1]) / h
                coords = f"{xc} {yc} {bw} {bh}"
            elif fmt == "abs-xywh":
                coords = f"{b[0]} {b[1]} {b[2] - b[0]} {b[3] - b[1]}"
            else:
                coords = f"{b[0]} {b[1]} {b[2]} {b[3]}"
            lines.append(f"{NAMES[c]}{conf} {coords}")
        (d / f"{img_id}.txt").write_text("\n".join(lines))
    return str(d)


def _voc_ap(gts, dets, names, method="all_point"):
    from simple_sfod_tpu.evaluation.voc import PascalVOCEvaluator

    ev = PascalVOCEvaluator(names, method=method)
    for img_id, gt in gts.items():
        det = dets.get(img_id, {"boxes": [], "classes": [], "scores": []})
        ev.process_image(
            img_id,
            np.asarray(det["boxes"], np.float64).reshape(-1, 4),
            np.asarray(det["scores"], np.float64),
            np.asarray(det["classes"], np.int64),
            np.asarray(gt["boxes"], np.float64).reshape(-1, 4),
            np.asarray(gt["classes"], np.int64),
        )
    return ev.evaluate()


class TestFormatsAgree:
    def test_all_formats_same_voc_ap(self, tmp_path):
        sizes = {k: IMG_SIZE for k in GT}
        # reference result straight from in-memory dicts
        want = _voc_ap(GT, DETS, NAMES)["VOC_AP50"]
        assert want > 0

        # coco
        gt_path, det_path = _write_coco(tmp_path, GT, DETS)
        gts, names, _ = load_ground_truth(gt_path, "coco")
        dets = load_detections(det_path, "coco", gt_path=gt_path)
        assert names == NAMES
        assert _voc_ap(gts, dets, names)["VOC_AP50"] == pytest.approx(want)

        # voc XML GT + abs-xyxy txt detections
        voc_dir = _write_voc(tmp_path, GT)
        det_dir = _write_txt(tmp_path, DETS, "abs-xyxy", True, "det_xyxy")
        gts2, names2, table = load_ground_truth(voc_dir, "voc", names=NAMES)
        dets2 = load_detections(det_dir, "abs-xyxy", table=table)
        assert _voc_ap(gts2, dets2, names2)["VOC_AP50"] == pytest.approx(want)

        # yolo relative txt for both (uses explicit sizes)
        from simple_sfod_tpu.evaluation.toolkit import read_txt_dir

        gt_dir = _write_txt(tmp_path, GT, "yolo", False, "gt_yolo")
        det_dir3 = _write_txt(tmp_path, DETS, "yolo", True, "det_yolo")
        table3 = ClassTable(NAMES)
        gts3 = read_txt_dir(gt_dir, table3, "yolo", False, image_sizes=sizes)
        dets3 = read_txt_dir(det_dir3, table3, "yolo", True, image_sizes=sizes)
        assert _voc_ap(gts3, dets3, NAMES)["VOC_AP50"] == pytest.approx(want, abs=1e-6)

        # abs-xywh GT
        gt_dir4 = _write_txt(tmp_path, GT, "abs-xywh", False, "gt_xywh")
        gts4, names4, table4 = load_ground_truth(gt_dir4, "abs-xywh", names=NAMES)
        dets4 = load_detections(det_dir, "abs-xyxy", table=table4)
        assert _voc_ap(gts4, dets4, names4)["VOC_AP50"] == pytest.approx(want)

    def test_coco_gt_with_yolo_numeric_dets(self, tmp_path):
        """Mixed formats: COCO-JSON GT + yolo txt detections with NUMERIC
        class tokens. The det ids must map through the GT's category table
        (yolo ids index the names list), not first-seen assignment — a det
        file whose first line is class 1 used to scramble every class."""
        want = _voc_ap(GT, DETS, NAMES)["VOC_AP50"]
        gt_path, _ = _write_coco(tmp_path, GT, DETS)
        w, h = IMG_SIZE
        d = tmp_path / "det_yolo_num"
        d.mkdir()
        for img_id, rec in DETS.items():
            lines = []
            # class-1 lines FIRST so first-seen order would invert the map
            order = sorted(range(len(rec["classes"])), key=lambda i: -rec["classes"][i])
            for i in order:
                b = rec["boxes"][i]
                xc, yc = (b[0] + b[2]) / 2 / w, (b[1] + b[3]) / 2 / h
                bw, bh = (b[2] - b[0]) / w, (b[3] - b[1]) / h
                lines.append(
                    f"{rec['classes'][i]} {rec['scores'][i]} {xc} {yc} {bw} {bh}"
                )
            (d / f"{img_id}.txt").write_text("\n".join(lines))
        gts, names, table = load_ground_truth(gt_path, "coco")
        assert table is not None and table.frozen
        sizes = {k: IMG_SIZE for k in GT}
        from simple_sfod_tpu.evaluation.toolkit import read_txt_dir

        dets = read_txt_dir(str(d), table, "yolo", True, image_sizes=sizes)
        assert _voc_ap(gts, dets, names)["VOC_AP50"] == pytest.approx(want, abs=1e-6)

    def test_unknown_det_classes_dropped_with_warning(self, tmp_path):
        """A det class outside the table is dropped at LOAD time (with a
        warning) so COCO/VOC/F1 all see the same records instead of each
        treating class -1 differently."""
        import warnings

        gt_path, _ = _write_coco(tmp_path, GT, DETS)
        gts, names, table = load_ground_truth(gt_path, "coco")
        d = tmp_path / "det_bad"
        d.mkdir()
        (d / "img1.txt").write_text(
            "truck 0.95 10 10 50 50\nperson 0.9 12 11 52 49"
        )
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            dets = load_detections(str(d), "abs-xyxy", table=table)
        assert any("dropped 1" in str(c.message) for c in caught)
        assert dets["img1"]["classes"] == [0]
        assert dets["img1"]["scores"] == [0.9]

    def test_11_point_differs_but_close(self):
        all_pt = _voc_ap(GT, DETS, NAMES, "all_point")["VOC_AP50"]
        eleven = _voc_ap(GT, DETS, NAMES, "11_point")["VOC_AP50"]
        assert 0 < eleven <= 100 and abs(all_pt - eleven) < 20

    def test_cli_end_to_end(self, tmp_path, capsys):
        gt_path, det_path = _write_coco(tmp_path, GT, DETS)
        import metrics_tool

        sys.argv = [
            "metrics_tool",
            "--gt", gt_path, "--gt-format", "coco",
            "--det", det_path, "--det-format", "coco",
            "--metrics", "coco,voc,f1",
        ]
        results = metrics_tool.main()
        out = capsys.readouterr().out
        assert "== coco ==" in out and "== voc ==" in out and "== f1 ==" in out
        assert results["voc"]["VOC_AP50"] > 0
        assert results["coco"]["AP50"] > 0

    def test_html_report(self, tmp_path, capsys):
        """--html writes the GUI-equivalent artifact: stat tiles, per-class
        table, and one PR-curve SVG panel per class."""
        gt_path, det_path = _write_coco(tmp_path, GT, DETS)
        html_path = str(tmp_path / "report.html")
        import metrics_tool

        sys.argv = [
            "metrics_tool",
            "--gt", gt_path, "--gt-format", "coco",
            "--det", det_path, "--det-format", "coco",
            "--metrics", "coco,voc,f1",
            "--html", html_path,
        ]
        metrics_tool.main()
        capsys.readouterr()
        doc = open(html_path).read()
        assert doc.startswith("<!doctype html")
        for cls in NAMES:  # per-class table rows + PR panels
            assert doc.count(cls) >= 2
        assert doc.count("<svg") == len(NAMES)
        assert "polyline" in doc  # at least one real curve
        assert "AP50" in doc and "F1" in doc  # stat tiles

    def test_report_handles_missing_curves_and_nan(self):
        from simple_sfod_tpu.evaluation.report import render_report

        doc = render_report(
            {"coco": {"AP": float("nan"), "AP50": 12.0}},
            ["a", "b"],
            curves={"a": (np.asarray([0.0, 0.5]), np.asarray([1.0, 0.8]))},
        )
        assert "no detections" in doc  # class b has no curve
        assert "–" in doc  # nan renders as a dash, not 'nan'
