from .checkpointer import Checkpointer
from .torch_import import import_torch_checkpoint, import_torchvision_vgg

__all__ = ["Checkpointer", "import_torch_checkpoint", "import_torchvision_vgg"]
