from .config import RoMaConfig
from .tiny import TinyRoMa, TinyRoMaNet
from .xfeat import XFeatBackbone

__all__ = ["RoMaConfig", "TinyRoMa", "TinyRoMaNet", "XFeatBackbone"]
