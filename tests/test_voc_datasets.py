"""VOC-XML ingestion for the art datasets (clipart/comic/watercolor).

The reference registers them as Pascal-VOC XML datasets via
register_pascal_voc (/root/reference/daod/data/datasets.py:74-85): 20 VOC
classes for clipart, a 6-class subset for comic/watercolor. These tests
build a synthetic VOC tree, register it through the real name patterns,
train a step and evaluate through PascalVOCEvaluator end-to-end.
"""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from simple_sfod_tpu.data import datasets as D
from simple_sfod_tpu.data.voc import VOC6_CLASS_NAMES, VOC_CLASS_NAMES, load_voc_instances


def _write_xml(path, fname, w, h, objects):
    ann = ET.Element("annotation")
    ET.SubElement(ann, "filename").text = fname
    size = ET.SubElement(ann, "size")
    ET.SubElement(size, "width").text = str(w)
    ET.SubElement(size, "height").text = str(h)
    ET.SubElement(size, "depth").text = "3"
    for name, (x1, y1, x2, y2), difficult in objects:
        o = ET.SubElement(ann, "object")
        ET.SubElement(o, "name").text = name
        ET.SubElement(o, "difficult").text = str(difficult)
        bb = ET.SubElement(o, "bndbox")
        ET.SubElement(bb, "xmin").text = str(x1)
        ET.SubElement(bb, "ymin").text = str(y1)
        ET.SubElement(bb, "xmax").text = str(x2)
        ET.SubElement(bb, "ymax").text = str(y2)
    ET.ElementTree(ann).write(path)


def make_voc_tree(root, name, splits):
    """splits: {split: [(fileid, w, h, objects)]}; writes JPEGs + XMLs +
    ImageSets/Main lists under root/name."""
    from PIL import Image

    base = os.path.join(root, name)
    for d in ("ImageSets/Main", "Annotations", "JPEGImages"):
        os.makedirs(os.path.join(base, d), exist_ok=True)
    rs = np.random.RandomState(0)
    for split, items in splits.items():
        with open(os.path.join(base, "ImageSets", "Main", f"{split}.txt"), "w") as f:
            for fileid, w, h, objs in items:
                f.write(fileid + "\n")
                img = rs.randint(0, 255, (h, w, 3)).astype(np.uint8)
                Image.fromarray(img).save(
                    os.path.join(base, "JPEGImages", f"{fileid}.jpg"), quality=90
                )
                _write_xml(
                    os.path.join(base, "Annotations", f"{fileid}.xml"),
                    f"{fileid}.jpg", w, h, objs,
                )
    return base


@pytest.fixture
def registry_sandbox(monkeypatch, tmp_path):
    saved = dict(D.DATASET_REGISTRY)
    D.DATASET_REGISTRY.clear()
    monkeypatch.setenv("SFOD_DATASETS", str(tmp_path))
    yield tmp_path
    D.DATASET_REGISTRY.clear()
    D.DATASET_REGISTRY.update(saved)


# ids 0-3 in the 6-class list -> stays inside tiny_cfg's NUM_CLASSES=4
COMIC_TRAIN = [
    ("c0", 96, 64, [("bicycle", (10, 10, 40, 40), 0), ("horse", (1, 1, 20, 20), 0)]),
    ("c1", 96, 64, [("car", (5, 8, 60, 50), 0), ("cat", (30, 20, 80, 60), 1)]),
    ("c2", 96, 64, [("horse", (1, 1, 30, 30), 0)]),  # only unknown cls -> dropped
    ("c3", 96, 64, [("bird", (20, 10, 50, 45), 0)]),
]
COMIC_TEST = [
    ("t0", 96, 64, [("bicycle", (10, 10, 40, 40), 0)]),
    ("t1", 96, 64, [("car", (5, 8, 60, 50), 0)]),
]


class TestVOCReader:
    def test_reader_semantics(self, tmp_path):
        base = make_voc_tree(str(tmp_path), "comic", {"train": COMIC_TRAIN})
        data = load_voc_instances(base, "train", VOC6_CLASS_NAMES)
        assert data["thing_classes"] == VOC6_CLASS_NAMES
        recs = {r["voc_id"]: r for r in data["records"]}
        # c2 has only an out-of-subset object -> empty but KEPT (d2 filters
        # empties in the TRAIN loader, never at load; ref build.py:118)
        assert set(recs) == {"c0", "c1", "c2", "c3"}
        assert recs["c2"]["boxes"] == []
        r0 = recs["c0"]
        # unknown class skipped; xmin/ymin shift by -1 (d2 semantics)
        assert r0["classes"] == [VOC6_CLASS_NAMES.index("bicycle")]
        assert r0["boxes"] == [[9.0, 9.0, 40.0, 40.0]]
        assert r0["height"] == 64 and r0["width"] == 96
        # difficult objects are KEPT with their flag (d2's voc_eval needs it)
        assert len(recs["c1"]["classes"]) == 2
        assert 1 in recs["c1"]["difficult"]
        # dense integer image ids for the eval loop
        assert all(isinstance(r["image_id"], int) for r in data["records"])

    def test_registry_patterns(self, registry_sandbox):
        tmp = registry_sandbox
        make_voc_tree(str(tmp), "comic", {"train": COMIC_TRAIN})
        ds = D.get_dataset("comic_train")
        assert ds["thing_classes"] == VOC6_CLASS_NAMES
        assert len(ds["records"]) == 4  # empty c2 kept; train loader filters
        # lazy pattern branch: clipart gets the 20 VOC classes
        D.DATASET_REGISTRY.clear()
        D._register_by_pattern("clipart_traintest", root="/R")
        e = D.DATASET_REGISTRY["clipart_traintest"]
        assert e["voc_dirname"] == "/R/clipart" and e["voc_split"] == "traintest"
        assert e["thing_classes"] == VOC_CLASS_NAMES
        # eager and lazy agree
        D.DATASET_REGISTRY.clear()
        D.register_all_datasets(root="/R")
        assert D.DATASET_REGISTRY["comic_test"]["voc_dirname"] == "/R/comic"


class TestVOCEndToEnd:
    def test_train_step_and_voc_eval(self, registry_sandbox):
        """comic_train trains one real (non-synthetic) step and comic_test
        evaluates through PascalVOCEvaluator — the reference's cross-domain
        art workload shape (ref datasets.py:74-85 + base.py evaluator)."""
        from test_trainers import tiny_cfg

        from simple_sfod_tpu.engine.trainers import build_trainer

        tmp = registry_sandbox
        make_voc_tree(str(tmp), "comic", {"train": COMIC_TRAIN, "test": COMIC_TEST})
        cfg = tiny_cfg("base")
        cfg.DATASETS.TRAIN = ("comic_train",)
        cfg.DATASETS.TEST = ("comic_test",)
        tr = build_trainer(cfg)  # synthetic=False: reads the real JPEG/XML tree
        batch = next(iter(tr.build_train_loader()))
        metrics = tr.run_step(batch)
        assert np.isfinite(float(metrics["total_loss"]))
        res = tr.test()["comic_test"]
        # PascalVOCEvaluator keys + F1 appended (evaluation/build.py VOC branch)
        assert "VOC_AP50" in res and "F1" in res
        assert np.isfinite(res["VOC_AP50"])
