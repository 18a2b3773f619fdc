from .bpc import bpc_loss
from .tcd import tcd_loss

__all__ = ["bpc_loss", "tcd_loss"]
