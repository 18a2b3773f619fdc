"""Native C++ COCO evaluator vs the numpy implementation on random data."""

import numpy as np
import pytest

from simple_sfod_tpu.evaluation.coco_eval import coco_map
from simple_sfod_tpu.evaluation.native import available, coco_map_native


def random_case(seed, num_images=6, num_classes=3):
    rs = np.random.RandomState(seed)
    gts, dets = {}, {}
    for img in range(1, num_images + 1):
        ng = rs.randint(0, 6)
        gb = []
        for _ in range(ng):
            x, y = rs.uniform(0, 80, 2)
            w, h = rs.uniform(5, 60, 2)
            gb.append([x, y, x + w, y + h])
        gts[img] = {
            "boxes": np.asarray(gb).reshape(-1, 4),
            "classes": rs.randint(0, num_classes, ng),
        }
        nd = rs.randint(0, 10)
        db = []
        for _ in range(nd):
            if ng and rs.rand() < 0.6:  # jittered copy of a GT box
                base = gb[rs.randint(ng)]
                j = rs.uniform(-4, 4, 4)
                db.append([base[0] + j[0], base[1] + j[1], base[2] + j[2], base[3] + j[3]])
            else:
                x, y = rs.uniform(0, 80, 2)
                w, h = rs.uniform(5, 60, 2)
                db.append([x, y, x + w, y + h])
        dets[img] = {
            "boxes": np.asarray(db).reshape(-1, 4),
            "scores": rs.rand(nd),
            "classes": rs.randint(0, num_classes, nd),
        }
    return dets, gts


@pytest.mark.skipif(not available(), reason="native lib not built")
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_native_matches_numpy(seed):
    dets, gts = random_case(seed)
    a = coco_map(dets, gts, 3)
    b = coco_map_native(dets, gts, 3)
    for key in ("AP", "AP50", "AP75", "AR100"):
        if np.isnan(a[key]):
            assert np.isnan(b[key])
        else:
            assert abs(a[key] - b[key]) < 1e-6, (key, a[key], b[key])
    np.testing.assert_allclose(
        np.nan_to_num(a["per_class_AP50"], nan=-1),
        np.nan_to_num(b["per_class_AP50"], nan=-1),
        atol=1e-6,
    )


@pytest.mark.skipif(not available(), reason="native lib not built")
def test_recall_exactly_on_threshold_matches_numpy():
    """Recall landing EXACTLY on a 101-point threshold (7/20 = 0.35): the
    C++ used ri/100.0, which differs from np.linspace(0,1,101) by 1 ULP at
    10 indices (0.35 among them) and counted one extra interpolation point
    — native AP50 35.64 vs numpy/pycocotools 34.65. Pinned here after the
    ri*0.01 fix (bit-equal to linspace, verified in-python)."""
    gb = [[10.0 * i, 10.0, 10.0 * i + 8.0, 18.0] for i in range(20)]
    gts = {1: {"boxes": np.asarray(gb), "classes": np.zeros(20, np.int64)}}
    dets = {
        1: {
            "boxes": np.asarray(gb[:7]),
            "scores": np.linspace(0.9, 0.3, 7),
            "classes": np.zeros(7, np.int64),
        }
    }
    a = coco_map(dets, gts, 1)
    b = coco_map_native(dets, gts, 1)
    assert b is not None
    # 35 thresholds (0.00..0.34 plus NOT the 1-ULP-above-0.35 point) of
    # precision 1 -> 35/101
    assert abs(a["AP50"] - 100 * 35 / 101) < 1e-9
    assert abs(b["AP50"] - a["AP50"]) < 1e-12, (a["AP50"], b["AP50"])


@pytest.mark.skipif(not available(), reason="native lib not built")
def test_string_image_ids_fall_back_to_numpy():
    """Filename-stem image ids (the VOC/F1/toolkit convention) can't ride
    the int64 C ABI — coco_map_native must return None (numpy fallback),
    not crash mid-eval."""
    gts = {"img_0001": {"boxes": np.asarray([[0.0, 0.0, 10.0, 10.0]]),
                        "classes": np.zeros(1, np.int64)}}
    dets = {"img_0001": {"boxes": np.asarray([[0.0, 0.0, 10.0, 10.0]]),
                         "scores": np.asarray([0.9]),
                         "classes": np.zeros(1, np.int64)}}
    assert coco_map_native(dets, gts, 1) is None
    assert coco_map(dets, gts, 1)["AP50"] == 100.0


@pytest.mark.skipif(not available(), reason="native lib not built")
def test_mismatched_record_lengths_raise():
    """A record with 3 classes but 2 box rows previously made the C side
    read past the end of the box buffer; it must fail loudly like the
    numpy path."""
    gts = {1: {"boxes": np.asarray([[0.0, 0.0, 10.0, 10.0]]),
               "classes": np.zeros(1, np.int64)}}
    dets = {1: {"boxes": np.zeros((2, 4)),
                "scores": np.asarray([0.9, 0.8, 0.7]),
                "classes": np.zeros(3, np.int64)}}
    with pytest.raises(ValueError):
        coco_map_native(dets, gts, 1)
