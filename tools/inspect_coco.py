#!/usr/bin/env python
"""Render COCO GT annotations onto images for visual inspection (the
reference's cityscapes-to-coco-conversion/inspect_coco.py, rebuilt with
arguments and PNG output instead of an interactive window).

Usage:
  python tools/inspect_coco.py --json annotations/x.json --image-root imgs \
      --out /tmp/vis --limit 10
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", required=True)
    ap.add_argument("--image-root", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--limit", type=int, default=10)
    args = ap.parse_args()

    import numpy as np

    from simple_sfod_tpu.data.coco import load_coco_json
    from simple_sfod_tpu.utils.visualize import draw_detections

    data = load_coco_json(args.json, args.image_root, filter_empty=False)
    os.makedirs(args.out, exist_ok=True)
    from PIL import Image

    for rec in data["records"][: args.limit]:
        with Image.open(rec["file_name"]) as im:
            img = np.asarray(im.convert("RGB"), np.float32)
        vis = draw_detections(
            img,
            np.asarray(rec["boxes"]),
            np.asarray(rec["classes"]),
            class_names=data["thing_classes"],
            input_format="RGB",
        )
        out_path = os.path.join(args.out, os.path.basename(rec["file_name"]) + ".vis.png")
        Image.fromarray(vis).save(out_path)
        print(out_path)


if __name__ == "__main__":
    main()
