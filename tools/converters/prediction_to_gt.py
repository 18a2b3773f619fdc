#!/usr/bin/env python
"""Splice a model's COCO detection dump into a train JSON as pseudo ground
truth — stage 2 of the fixed-pseudo-label pipeline (SURVEY §3.5; the
reference's cityscapes-to-coco-conversion/prediction_to_gt.py:18-45 with its
hardcoded cluster paths replaced by arguments).

Usage:
  python tools/converters/prediction_to_gt.py \
      --predictions inference/coco_instances_results.json \
      --annotations instancesonly_filtered_gtFine_train_foggy_beta_0.02.json \
      --output .../instancesonly_filtered_gtFine_train_foggy_adabn.json \
      [--score-thresh 0.7]
"""

from __future__ import annotations

import argparse
import json


def convert(predictions: list, annotations: dict, score_thresh: float = 0.7) -> dict:
    pseudo = []
    next_id = 1
    for p in predictions:
        if p["score"] < score_thresh:
            continue
        pseudo.append(
            {
                "image_id": p["image_id"],
                "bbox": p["bbox"],  # XYWH, as in detection dumps
                "category_id": p["category_id"],
                "id": next_id,
                "area": float(p["bbox"][2] * p["bbox"][3]),
                "iscrowd": 0,
                "score": p["score"],
            }
        )
        next_id += 1
    out = dict(annotations)
    out["annotations"] = pseudo
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--predictions", required=True)
    ap.add_argument("--annotations", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--score-thresh", type=float, default=0.7)
    args = ap.parse_args()
    with open(args.predictions) as f:
        preds = json.load(f)
    with open(args.annotations) as f:
        anns = json.load(f)
    out = convert(preds, anns, args.score_thresh)
    with open(args.output, "w") as f:
        json.dump(out, f)
    print(f"wrote {len(out['annotations'])} pseudo-GT annotations -> {args.output}")


if __name__ == "__main__":
    main()
