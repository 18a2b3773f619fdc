"""Dataset registry mirroring the reference's name patterns.

Re-implements /root/reference/daod/data/datasets.py:17-105: names like
`cityscapes_instancesonly_{train,val}[_foggy_*]`, `sim10k_*`, `kitti_*`,
`clipart/comic/watercolor_*` resolve to COCO-JSON files under a dataset root
(env `SFOD_DATASETS`, falling back to `DETECTRON2_DATASETS` for drop-in
compatibility).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

from .coco import load_coco_json

DATASET_REGISTRY: Dict[str, dict] = {}

CITYSCAPES_THING_CLASSES = [
    "person",
    "rider",
    "car",
    "truck",
    "bus",
    "train",
    "motorcycle",
    "bicycle",
]


def _root() -> str:
    return os.environ.get(
        "SFOD_DATASETS", os.environ.get("DETECTRON2_DATASETS", "datasets")
    )


def register_dataset(
    name: str,
    json_file: str,
    image_root: str,
    thing_classes: Optional[list] = None,
    class_remap: Optional[dict] = None,
):
    """class_remap: optional {contiguous_id -> new_id} used for the car-only
    Sim10k/KITTI -> Cityscapes evaluations (reference sim_cocoevaluator.py)."""
    DATASET_REGISTRY[name] = {
        "name": name,
        "json_file": json_file,
        "image_root": image_root,
        "thing_classes": thing_classes,
        "class_remap": class_remap,
        "_cache": None,
    }


def get_dataset(name: str) -> dict:
    """Resolve + lazily load a registered dataset; returns the registry entry
    with 'records' and 'thing_classes' filled in."""
    if name not in DATASET_REGISTRY:
        register_all_datasets()
    if name not in DATASET_REGISTRY:
        raise KeyError(f"dataset {name!r} is not registered")
    entry = DATASET_REGISTRY[name]
    if entry["_cache"] is None:
        data = load_coco_json(entry["json_file"], entry["image_root"])
        if entry["thing_classes"]:
            data["thing_classes"] = entry["thing_classes"]
        entry["_cache"] = data
    entry.update(entry["_cache"])
    return entry


def register_all_datasets(root: Optional[str] = None):
    """Register the reference's dataset name patterns (datasets.py:41-105)."""
    root = root or _root()
    cs = os.path.join(root, "cityscapes")

    def reg(name, json_rel, img_rel, classes=CITYSCAPES_THING_CLASSES):
        if name not in DATASET_REGISTRY:
            register_dataset(
                name, os.path.join(cs, json_rel), os.path.join(cs, img_rel), classes
            )

    for split in ("train", "val", "test"):
        reg(
            f"cityscapes_instancesonly_{split}",
            f"annotations/instancesonly_filtered_gtFine_{split}.json",
            f"leftImg8bit/{split}",
        )
        for beta in ("0.02", "0.01", "0.005"):
            reg(
                f"cityscapes_instancesonly_foggy_{split}_foggy_beta_{beta}",
                f"annotations/instancesonly_filtered_gtFine_{split}_foggy_beta_{beta}.json",
                f"leftImg8bit_foggy/{split}",
            )
        # AdaBN / fixed-pseudo-label spliced annotation files
        # (prediction_to_gt.py output re-registered as GT)
        reg(
            f"cityscapes_instancesonly_foggy_{split}_adabn",
            f"annotations/instancesonly_filtered_gtFine_{split}_foggy_adabn.json",
            f"leftImg8bit_foggy/{split}",
        )

    sim = os.path.join(root, "sim10k")
    if "sim10k_trainval" not in DATASET_REGISTRY:
        register_dataset(
            "sim10k_trainval",
            os.path.join(sim, "annotations/sim10k_trainval.json"),
            os.path.join(sim, "JPEGImages"),
            ["car"],
        )
    kitti = os.path.join(root, "kitti")
    if "kitti_train" not in DATASET_REGISTRY:
        register_dataset(
            "kitti_train",
            os.path.join(kitti, "annotations/kitti_train.json"),
            os.path.join(kitti, "training/image_2"),
            ["car"],
        )
    voc_root = os.path.join(root, "cross_domain")
    for name in ("clipart", "comic", "watercolor"):
        for split in ("train", "test"):
            key = f"{name}_{split}"
            if key not in DATASET_REGISTRY:
                register_dataset(
                    key,
                    os.path.join(voc_root, name, f"annotations/{split}.json"),
                    os.path.join(voc_root, name, "JPEGImages"),
                    None,
                )
