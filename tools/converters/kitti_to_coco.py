#!/usr/bin/env python
"""KITTI label txt -> COCO JSON (the reference's kitti_to_coco/transfer.py
with its class map Car/Pedestrian/Cyclist, rebuilt with arguments).

Usage:
  python tools/converters/kitti_to_coco.py --label-dir kitti/training/label_2 \
      --image-dir kitti/training/image_2 --output kitti/annotations/kitti_train.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os

# KITTI class -> category id (reference transfer.py:26-30)
CLASS_MAP = {"Car": 1, "Pedestrian": 2, "Cyclist": 3}
CATEGORIES = [{"id": v, "name": k.lower()} for k, v in CLASS_MAP.items()]


def convert(label_dir: str, image_dir: str) -> dict:
    from PIL import Image

    images, annotations = [], []
    ann_id = 1
    for path in sorted(glob.glob(os.path.join(label_dir, "*.txt"))):
        img_id = int(os.path.basename(path).split(".")[0])
        img_name = f"{img_id:06d}.png"
        img_path = os.path.join(image_dir, img_name)
        with Image.open(img_path) as im:
            width, height = im.size
        images.append(
            {"id": img_id, "file_name": img_name, "height": height, "width": width}
        )
        with open(path) as f:
            for line in f:
                parts = line.split()
                if not parts or parts[0] not in CLASS_MAP:
                    continue
                x1, y1, x2, y2 = map(float, parts[4:8])
                if x2 <= x1 or y2 <= y1:
                    continue
                annotations.append(
                    {
                        "id": ann_id,
                        "image_id": img_id,
                        "category_id": CLASS_MAP[parts[0]],
                        "bbox": [x1, y1, x2 - x1, y2 - y1],
                        "area": (x2 - x1) * (y2 - y1),
                        "iscrowd": 0,
                    }
                )
                ann_id += 1
    return {"images": images, "annotations": annotations, "categories": CATEGORIES}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--label-dir", required=True)
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()
    out = convert(args.label_dir, args.image_dir)
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(out, f)
    print(f"{len(out['images'])} images, {len(out['annotations'])} annotations")
