from .megadepth import ConcatDataset, MegadepthBuilder, MegadepthScene
from .scannet import ScanNetBuilder, ScanNetScene

__all__ = [
    "ConcatDataset",
    "MegadepthBuilder",
    "MegadepthScene",
    "ScanNetBuilder",
    "ScanNetScene",
]
