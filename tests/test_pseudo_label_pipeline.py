"""End-to-end fixed pseudo-label pipeline (SURVEY §3.5): detections dump ->
prediction_to_gt splice -> re-register as GT -> WQ training step.

Reuses test_trainers.tiny_cfg shapes (64x128) so the compiled graphs are
shared with the rest of the suite (cold compiles of the SPMD step at larger
canvases take tens of minutes on this 1-core host)."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools", "converters"))

from simple_sfod_tpu.data.datasets import DATASET_REGISTRY, register_dataset
from simple_sfod_tpu.engine.trainers import build_trainer

from prediction_to_gt import convert  # noqa: E402
from test_trainers import tiny_cfg  # noqa: E402


def test_pipeline_roundtrip(tmp_path):
    cfg = tiny_cfg("base")
    cfg.OUTPUT_DIR = "/tmp/sfod_pl_pipeline"
    cfg.freeze()

    # stage 1: run inference, dump detections JSON
    tr = build_trainer(cfg, synthetic=True)
    tr.test()
    dump_path = os.path.join(cfg.OUTPUT_DIR, "inference", "coco_instances_results.json")
    assert os.path.exists(dump_path)
    with open(dump_path) as f:
        preds = json.load(f)
    # random weights still emit low-score detections; force a few confident
    # ones so the splice has content at the reference's 0.7 threshold
    if not any(p["score"] >= 0.7 for p in preds):
        preds.append(
            {"image_id": 1, "category_id": 1, "bbox": [4, 4, 30, 30], "score": 0.95}
        )

    # stage 2: splice into a train JSON as pseudo-GT
    base_ann = {
        "images": [
            {"id": r["image_id"], "file_name": r["file_name"], "height": r["height"], "width": r["width"]}
            for r in DATASET_REGISTRY["synthetic_target"]["_cache"]["records"]
        ],
        "categories": [{"id": i + 1, "name": f"c{i}"} for i in range(4)],
        "annotations": [],
    }
    spliced = convert(preds, base_ann, score_thresh=0.7)
    assert len(spliced["annotations"]) >= 1
    out_json = tmp_path / "pseudo_gt.json"
    with open(out_json, "w") as f:
        json.dump(spliced, f)

    # stage 3: register the spliced JSON and run one WQ training step on it
    register_dataset(
        "synthetic_pseudo", str(out_json), image_root="", thing_classes=[f"c{i}" for i in range(4)]
    )
    cfg2 = tiny_cfg("base_wq")
    cfg2.DATASETS.TRAIN = ("synthetic_pseudo",)
    cfg2.OUTPUT_DIR = "/tmp/sfod_pl_pipeline2"
    cfg2.freeze()
    tr2 = build_trainer(cfg2, synthetic=True)
    batch = next(iter(tr2.build_train_loader()))
    metrics = tr2.run_step(batch)
    assert np.isfinite(float(metrics["total_loss"]))
