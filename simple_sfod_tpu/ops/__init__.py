from .anchors import generate_anchors, generate_cell_anchors
from .matcher import match_boxes, MatcherConfig
from .sampler import subsample_labels
from .nms import nms_mask, batched_class_nms
from .roi_align import roi_align

__all__ = [
    "generate_anchors",
    "generate_cell_anchors",
    "match_boxes",
    "MatcherConfig",
    "subsample_labels",
    "nms_mask",
    "batched_class_nms",
    "roi_align",
]
