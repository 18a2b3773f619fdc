from .cfg_node import CfgNode
from .defaults import get_cfg, detector_config_from_cfg

__all__ = ["CfgNode", "get_cfg", "detector_config_from_cfg"]
