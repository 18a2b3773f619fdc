"""Synthetic tiny-COCO fixture: deterministic rectangles-on-noise images with
exact GT — used by tests and by `bench.py` when no real dataset is mounted
(the reference assumes Cityscapes on disk; see SURVEY §4 for why we add this).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .datasets import register_dataset, DATASET_REGISTRY


def make_synthetic_records(
    num_images: int = 16,
    image_hw: Tuple[int, int] = (128, 256),
    num_classes: int = 8,
    max_boxes: int = 6,
    seed: int = 0,
) -> List[dict]:
    rs = np.random.RandomState(seed)
    h, w = image_hw
    records = []
    for i in range(num_images):
        n = rs.randint(1, max_boxes + 1)
        boxes, classes = [], []
        for _ in range(n):
            bw = rs.randint(w // 8, w // 3)
            bh = rs.randint(h // 8, h // 3)
            x1 = rs.randint(0, w - bw)
            y1 = rs.randint(0, h - bh)
            boxes.append([float(x1), float(y1), float(x1 + bw), float(y1 + bh)])
            classes.append(int(rs.randint(0, num_classes)))
        records.append(
            {
                "file_name": f"synthetic_{i}.png",
                "height": h,
                "width": w,
                "image_id": i + 1,
                "boxes": boxes,
                "classes": classes,
            }
        )
    return records


def register_synthetic(
    name: str = "synthetic_train",
    num_images: int = 16,
    image_hw: Tuple[int, int] = (128, 256),
    num_classes: int = 8,
    seed: int = 0,
):
    records = make_synthetic_records(num_images, image_hw, num_classes, seed=seed)
    register_dataset(name, json_file="", image_root="", thing_classes=[f"c{i}" for i in range(num_classes)])
    DATASET_REGISTRY[name]["_cache"] = {
        "records": records,
        "thing_classes": [f"c{i}" for i in range(num_classes)],
        "id_map": {i: i for i in range(num_classes)},
    }
    return records
