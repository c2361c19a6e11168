from .attention import attention_packed, sdpa
from .cls_to_flow import cls_to_flow_refine
from .coords import (
    batched_grid,
    normalized_grid,
    to_normalized_coords,
    to_pixel_coords,
    warp_to_pixel_coords,
)
from .grid_sample import grid_sample
from .interpolate import interpolate
from .kde import kde
from .local_corr import corr_volume, local_correlation
from .lane_warp import warp_sample
from .sampling import balanced_sample, multinomial_no_replacement

__all__ = [
    "sdpa",
    "attention_packed",
    "cls_to_flow_refine",
    "batched_grid",
    "normalized_grid",
    "to_normalized_coords",
    "to_pixel_coords",
    "warp_to_pixel_coords",
    "grid_sample",
    "interpolate",
    "kde",
    "corr_volume",
    "local_correlation",
    "warp_sample",
    "balanced_sample",
    "multinomial_no_replacement",
]
