"""Drive the interactive metrics GUI (evaluation/gui.py — the web re-build
of the reference's PyQt5 shell, daod/src/ui/) end-to-end over HTTP: form,
GT/detection statistics, annotated-image browser, and a full metrics run
that writes the report artifacts."""

import json
import os
import urllib.parse
import urllib.request

import numpy as np
import pytest

from simple_sfod_tpu.evaluation.gui import serve_in_thread

from test_metrics_tool import DETS, GT, IMG_SIZE, NAMES, _write_coco


@pytest.fixture(scope="module")
def server():
    srv, base = serve_in_thread()
    yield base
    srv.shutdown()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return r.status, r.read().decode()


def _post(base, path, fields):
    data = urllib.parse.urlencode(fields, doseq=True).encode()
    req = urllib.request.Request(base + path, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status, r.read().decode()


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("gui_scene")
    gt_path, det_path = _write_coco(tmp, GT, DETS)
    # tiny real images so the browser has something to draw over; stems must
    # match the coco file_name entries we add below
    from PIL import Image

    img_dir = tmp / "imgs"
    img_dir.mkdir()
    for stem in GT:
        Image.new("RGB", IMG_SIZE, (90, 90, 120)).save(img_dir / f"{stem}.png")
    data = json.load(open(gt_path))
    for img in data["images"]:
        img["file_name"] = f"{img['id']}.png"
    json.dump(data, open(gt_path, "w"))
    return {"gt": gt_path, "det": det_path, "img_dir": str(img_dir), "out": str(tmp / "out")}


def test_form_page(server):
    status, doc = _get(server, "/")
    assert status == 200
    for field in ("name='gt'", "name='det'", "name='iou'", "formaction='/run'"):
        assert field in doc
    # all formats offered
    for fmt in ("coco", "voc", "yolo", "abs-xywh", "abs-xyxy"):
        assert f"value='{fmt}'" in doc


def test_gt_statistics(server, scene):
    status, doc = _post(
        server,
        "/stats?which=gt",
        {"gt": scene["gt"], "gt_format": "coco", "img_dir": scene["img_dir"]},
    )
    assert status == 200
    # 3 GT boxes over 2 images; per-class counts person=2 car=1
    assert "A total of <b>3</b> bounding boxes were found in <b>2</b> images" in doc
    assert "person" in doc and "car" in doc
    assert "<svg" in doc  # bar chart
    assert "/view?" in doc  # image browser offered


def test_det_statistics(server, scene):
    status, doc = _post(
        server,
        "/stats?which=det",
        {
            "gt": scene["gt"],
            "gt_format": "coco",
            "det": scene["det"],
            "det_format": "coco",
        },
    )
    assert status == 200
    assert "A total of <b>4</b> bounding boxes were found in <b>2</b> images" in doc


def test_image_browser_overlay(server, scene):
    q = urllib.parse.urlencode(
        {
            "gt": scene["gt"],
            "gt_format": "coco",
            "det": scene["det"],
            "det_format": "coco",
            "img_dir": scene["img_dir"],
            "which": "det",
            "idx": 0,
        }
    )
    status, doc = _get(server, f"/view?{q}")
    assert status == 200
    # GT rects green, det rects red with score text
    assert "stroke='#19c37d'" in doc and "stroke='#e5484d'" in doc
    assert "0.90" in doc or "0.30" in doc or "0.70" in doc
    assert "next" in doc and "previous" in doc
    # the embedded image is servable
    img_q = urllib.parse.urlencode({"dir": scene["img_dir"], "name": "img1.png"})
    with urllib.request.urlopen(server + f"/imgfile?{img_q}", timeout=10) as r:
        assert r.status == 200 and r.headers["Content-Type"] == "image/png"
        assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"


def test_imgfile_traversal_blocked(server, scene):
    q = urllib.parse.urlencode({"dir": scene["img_dir"], "name": "../gt.json"})
    req = urllib.request.Request(server + f"/imgfile?{q}")
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=10)
    assert exc.value.code == 403


def test_run_metrics_and_artifacts(server, scene):
    status, doc = _post(
        server,
        "/run",
        {
            "gt": scene["gt"],
            "gt_format": "coco",
            "det": scene["det"],
            "det_format": "coco",
            "metrics": ["coco", "voc", "f1"],
            "iou": "0.5",
            "voc_method": "all_point",
            "out": scene["out"],
        },
    )
    assert status == 200
    assert "AP50" in doc and "F1" in doc and "<svg" in doc  # inline report
    assert "back to the" in doc  # injected nav
    # artifacts written
    report = open(os.path.join(scene["out"], "report.html")).read()
    assert report.startswith("<!doctype html")
    results = json.load(open(os.path.join(scene["out"], "results.json")))
    assert results["voc"]["VOC_AP50"] > 0
    assert results["coco"]["AP50"] > 0
    # GUI results equal the CLI engine's results on the same inputs
    from simple_sfod_tpu.evaluation.runner import load_inputs, run_metrics

    gts, dets, class_names = load_inputs(scene["gt"], "coco", scene["det"], "coco")
    want, _ = run_metrics(gts, dets, class_names, metrics={"voc"})
    assert results["voc"]["VOC_AP50"] == pytest.approx(want["voc"]["VOC_AP50"])


def test_errors_surface_as_form_message(server):
    status, doc = _post(
        server, "/run", {"gt": "/nonexistent/gt.json", "gt_format": "coco", "det": "x"}
    )
    assert status == 200
    assert "err" in doc and ("FileNotFoundError" in doc or "No such file" in doc)
