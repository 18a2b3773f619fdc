"""Per-dataset evaluator selection (reference BaseTrainer.build_evaluator,
base.py:125-161): COCO mAP + F1 by default; the car-only remapped protocol
for Sim10k/KITTI cross-domain evals (sim_cocoevaluator.py: car-family
predictions {car, truck, bus} collapse onto the single 'car' GT class);
VOC AP50 for the clipart/comic/watercolor VOC datasets; DECE when
calibration is requested."""

from __future__ import annotations

from .coco_eval import COCOEvaluator
from .dece import DECEEvaluator
from .f1 import F1Evaluator
from .voc import PascalVOCEvaluator

# Cityscapes contiguous ids: person 0, rider 1, car 2, truck 3, bus 4,
# train 5, motorcycle 6, bicycle 7. The reference's SimCOCOEvaluator remap
# sends the car-family onto the car class and drops the rest.
CAR_ONLY_REMAP = {0: -1, 1: -1, 2: 0, 3: 0, 4: 0, 5: -1, 6: -1, 7: -1}

VOC_DATASET_PREFIXES = ("clipart", "comic", "watercolor")


def build_evaluators(cfg, dataset_name: str, thing_classes):
    f1_mode = getattr(cfg.TEST, "F1_MODE", "reference")
    evaluators = []
    if any(dataset_name.startswith(p) for p in VOC_DATASET_PREFIXES):
        # d2's voc_eval needs the difficult flags, which the fixed-capacity
        # eval batches do not carry — hand the evaluator a per-image map
        # from the registry records (same order as the batched GT rows).
        # Best-effort: a registered-but-absent dataset (evaluator built
        # standalone) just gets no difficult handling.
        try:
            from ..data.datasets import get_dataset

            difficult_map = {
                r["image_id"]: r.get("difficult", ())
                for r in get_dataset(dataset_name)["records"]
            }
        except Exception:
            difficult_map = None
        evaluators.append(
            PascalVOCEvaluator(thing_classes, difficult_map=difficult_map)
        )
        evaluators.append(F1Evaluator(mode=f1_mode))
        return evaluators
    # a remap registered with the dataset wins; the heuristic below covers
    # the shipped car-only Sim10k/KITTI names (previously the registry field
    # was write-only and a custom registration's remap was silently ignored)
    registered_remap = None
    try:
        registered_remap = get_dataset(dataset_name).get("class_remap")
    except Exception:
        pass
    car_only = len(thing_classes) == 1 and ("sim10k" in dataset_name or "kitti" in dataset_name or list(thing_classes) == ["car"])
    if registered_remap is not None:
        evaluators.append(
            COCOEvaluator(
                thing_classes,
                class_remap=registered_remap,
                max_dets=cfg.TEST.DETECTIONS_PER_IMAGE,
            )
        )
    elif car_only and cfg.MODEL.ROI_HEADS.NUM_CLASSES == 8:
        evaluators.append(
            COCOEvaluator(["car"], class_remap=CAR_ONLY_REMAP, max_dets=cfg.TEST.DETECTIONS_PER_IMAGE)
        )
    else:
        evaluators.append(COCOEvaluator(thing_classes, max_dets=cfg.TEST.DETECTIONS_PER_IMAGE))
    evaluators.append(F1Evaluator(mode=f1_mode))
    evaluators.append(DECEEvaluator())
    return evaluators
