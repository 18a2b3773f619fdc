from .datasets import register_all_datasets, register_dataset, get_dataset, DATASET_REGISTRY
from .coco import load_coco_json
from .loader import DetectionLoader, build_train_loader, build_test_loader

__all__ = [
    "register_all_datasets",
    "register_dataset",
    "get_dataset",
    "DATASET_REGISTRY",
    "load_coco_json",
    "DetectionLoader",
    "build_train_loader",
    "build_test_loader",
]
