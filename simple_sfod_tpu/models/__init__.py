from .backbones.vgg import VGG16Backbone
from .backbones.resnet import ResNetBackbone
from .heads import RPNHead, FastRCNNConvFCHead, FastRCNNPredictor
from .faster_rcnn import FasterRCNN, DetectorConfig

__all__ = [
    "VGG16Backbone",
    "ResNetBackbone",
    "RPNHead",
    "FastRCNNConvFCHead",
    "FastRCNNPredictor",
    "FasterRCNN",
    "DetectorConfig",
]
