"""Pascal-VOC XML dataset ingestion.

The reference registers clipart / comic / watercolor as Pascal-VOC XML
datasets via detectron2's ``register_pascal_voc``
(/root/reference/daod/data/datasets.py:74-85): 20 VOC classes for clipart, a
6-class subset for comic/watercolor. This is the XML-reader equivalent,
producing the repo's standard record schema (same as data/coco.py
load_coco_json) so the loader / trainers / evaluators are format-blind.

Layout (the cross-domain-detection release layout, same as VOC):
    <dirname>/ImageSets/Main/<split>.txt   one file id per line
    <dirname>/Annotations/<id>.xml         objects with 1-based inclusive boxes
    <dirname>/JPEGImages/<id>.jpg
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Dict, Sequence

# detectron2 pascal_voc CLASS_NAMES — the clipart class list
VOC_CLASS_NAMES = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]
# comic / watercolor subset (ref datasets.py:82)
VOC6_CLASS_NAMES = ["bicycle", "bird", "car", "cat", "dog", "person"]


def load_voc_instances(
    dirname: str,
    split: str,
    class_names: Sequence[str],
    filter_empty: bool = False,
) -> Dict:
    """Returns {'records': [...], 'thing_classes': [...], 'id_map': {...}}.

    Box semantics follow d2's load_voc_instances: VOC annotations are 1-based
    inclusive pixel indices, so xmin/ymin get -1 to land in [0, W) coordinate
    space; "difficult" objects are kept WITH their flag (records carry a
    'difficult' list — d2's voc_eval excludes difficult GT from the AP
    denominator and ignores detections matched to them). image_id is the
    dense index of the file id within the split file (the eval loop requires
    integer ids); the VOC file id is kept as 'voc_id'. Objects whose class
    name is outside class_names are skipped (the 6-class subsets).

    filter_empty defaults to False like d2's dataset loading: dropping
    no-annotation images is a TRAIN-loader decision
    (DATALOADER.FILTER_EMPTY_ANNOTATIONS, applied in data/loader.py) — at
    eval time every split image must be scored or false positives on empty
    images would never be counted (ref build.py:118 filter_empty=False)."""
    class_index = {n: i for i, n in enumerate(class_names)}
    split_file = os.path.join(dirname, "ImageSets", "Main", f"{split}.txt")
    with open(split_file) as f:
        fileids = [ln.strip() for ln in f if ln.strip()]

    records = []
    for image_id, fileid in enumerate(fileids):
        ann_file = os.path.join(dirname, "Annotations", f"{fileid}.xml")
        tree = ET.parse(ann_file)
        height = int(tree.findall("./size/height")[0].text)
        width = int(tree.findall("./size/width")[0].text)
        boxes, classes, difficult = [], [], []
        for obj in tree.findall("object"):
            cls = obj.find("name").text
            if cls not in class_index:
                continue
            bb = obj.find("bndbox")
            x1, y1, x2, y2 = (
                float(bb.find(k).text) for k in ("xmin", "ymin", "xmax", "ymax")
            )
            boxes.append([x1 - 1.0, y1 - 1.0, x2, y2])
            classes.append(class_index[cls])
            diff = obj.find("difficult")
            difficult.append(int(diff.text) if diff is not None else 0)
        if filter_empty and not boxes:
            continue
        records.append(
            {
                "file_name": os.path.join(dirname, "JPEGImages", f"{fileid}.jpg"),
                "height": height,
                "width": width,
                "image_id": image_id,
                "voc_id": fileid,
                "boxes": boxes,
                "classes": classes,
                "difficult": difficult,
            }
        )
    return {
        "records": records,
        "thing_classes": list(class_names),
        "id_map": {i: i for i in range(len(class_names))},
    }
