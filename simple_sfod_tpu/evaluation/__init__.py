from .coco_eval import COCOEvaluator, coco_map
from .f1 import F1Evaluator
from .dece import DECEEvaluator

__all__ = ["COCOEvaluator", "coco_map", "F1Evaluator", "DECEEvaluator"]
