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
