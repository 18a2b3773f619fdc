from .anchors import generate_anchors, generate_cell_anchors
from .matcher import match_boxes, MatcherConfig
from .sampler import subsample_labels
# nms_mask_matrix is the production NMS (the tiled nms_mask variant
# compiles pathologically on the real TPU backend — BENCH_NOTES)
from .nms import nms_mask, nms_mask_matrix, batched_class_nms
from .roi_align import roi_align

__all__ = [
    "generate_anchors",
    "generate_cell_anchors",
    "match_boxes",
    "MatcherConfig",
    "subsample_labels",
    "nms_mask",
    "nms_mask_matrix",
    "batched_class_nms",
    "roi_align",
]
