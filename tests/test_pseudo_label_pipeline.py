"""Fixed pseudo-label pipeline stages 2-3 (SURVEY §3.5): splice a COCO
detections dump into a train JSON as pseudo-GT, re-register it, and train the
WQ trainer on it.

Stage 1 (the detections dump during eval) is exercised by the AdaBN CLI flow
(verified end-to-end; see .claude/skills/verify/SKILL.md) — running a full
eval inside this test tripped a pathologically slow XLA compile under pytest
on the 1-core CI host, so the dump JSON is fabricated here."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools", "converters"))

from simple_sfod_tpu.data.datasets import DATASET_REGISTRY, register_dataset
from simple_sfod_tpu.engine.trainers import build_trainer

from prediction_to_gt import convert  # noqa: E402
from test_trainers import tiny_cfg  # noqa: E402


def test_pipeline_splice_and_train(tmp_path):
    cfg = tiny_cfg("base_wq")  # registers the synthetic datasets
    # stage 1 output (fabricated detections dump, XYWH COCO boxes)
    preds = [
        {"image_id": 1, "category_id": 1, "bbox": [4, 4, 30, 30], "score": 0.95},
        {"image_id": 1, "category_id": 2, "bbox": [60, 10, 20, 25], "score": 0.81},
        {"image_id": 2, "category_id": 1, "bbox": [10, 10, 25, 25], "score": 0.40},  # below thresh
        {"image_id": 3, "category_id": 3, "bbox": [5, 20, 40, 30], "score": 0.72},
    ]

    # stage 2: splice into a train JSON as pseudo-GT (score >= 0.7 like the
    # reference's prediction_to_gt.py:22)
    base_ann = {
        "images": [
            {"id": r["image_id"], "file_name": r["file_name"], "height": r["height"], "width": r["width"]}
            for r in DATASET_REGISTRY["synthetic_target"]["_cache"]["records"]
        ],
        "categories": [{"id": i + 1, "name": f"c{i}"} for i in range(4)],
        "annotations": [],
    }
    spliced = convert(preds, base_ann, score_thresh=0.7)
    assert len(spliced["annotations"]) == 3  # the 0.40 det dropped
    assert all(a["score"] >= 0.7 for a in spliced["annotations"])
    out_json = tmp_path / "pseudo_gt.json"
    with open(out_json, "w") as f:
        json.dump(spliced, f)

    # stage 3: register the spliced JSON and run one WQ training step on it
    register_dataset(
        "synthetic_pseudo", str(out_json), image_root="", thing_classes=[f"c{i}" for i in range(4)]
    )
    cfg.DATASETS.TRAIN = ("synthetic_pseudo",)
    cfg.OUTPUT_DIR = "/tmp/sfod_pl_pipeline"
    cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS = True
    cfg.freeze()
    tr = build_trainer(cfg, synthetic=True)
    loader = tr.build_train_loader()
    # only images with pseudo-GT survive the empty filter
    assert {r["image_id"] for r in loader.records} == {1, 3}
    batch = next(iter(loader))
    assert batch["gt_valid"].sum() >= 1
    metrics = tr.run_step(batch)
    assert np.isfinite(float(metrics["total_loss"]))
