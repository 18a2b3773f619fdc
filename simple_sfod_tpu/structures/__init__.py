from .boxes import (
    area,
    clip_boxes,
    nonempty,
    pairwise_iou,
    pairwise_ioa,
    encode_deltas,
    decode_deltas,
    BoxTransform,
)
from .instances import Instances, pad_instances
from .image_list import ImageBatch

__all__ = [
    "area",
    "clip_boxes",
    "nonempty",
    "pairwise_iou",
    "pairwise_ioa",
    "encode_deltas",
    "decode_deltas",
    "BoxTransform",
    "Instances",
    "pad_instances",
    "ImageBatch",
]
