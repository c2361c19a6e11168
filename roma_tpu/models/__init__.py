from .tiny import TinyRoMa, TinyRoMaNet
from .xfeat import XFeatBackbone

__all__ = ["TinyRoMa", "TinyRoMaNet", "XFeatBackbone"]
