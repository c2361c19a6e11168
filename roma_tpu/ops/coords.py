"""Coordinate-grid helpers shared across the framework.

All warps/flows use the reference's normalized convention: coordinates live in
[-1, 1]^2, (x, y) channel order, where pixel centers of an axis of length n sit
at linspace(-1 + 1/n, 1 - 1/n, n) (cf. reference romatch/utils/utils.py:627-636
``get_grid`` and matcher.py:136-144).

TPU-first conventions in this package:
  * images/features are NHWC,
  * flows/warps are channel-last ``(B, H, W, 2)``,
  * certainty is ``(B, H, W, 1)``.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _grid_np(h: int, w: int) -> np.ndarray:
    ys = np.linspace(-1 + 1 / h, 1 - 1 / h, h, dtype=np.float32)
    xs = np.linspace(-1 + 1 / w, 1 - 1 / w, w, dtype=np.float32)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    return np.stack((gx, gy), axis=-1)  # (h, w, 2), xy order


def normalized_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(h, w, 2) grid of normalized pixel-center coordinates, (x, y) order."""
    return jnp.asarray(_grid_np(h, w), dtype=dtype)


def batched_grid(b: int, h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(b, h, w, 2) broadcasted normalized grid (reference ``get_grid``)."""
    return jnp.broadcast_to(normalized_grid(h, w, dtype), (b, h, w, 2))


def to_pixel_coords(coords: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[-1,1] normalized (x, y) -> pixel coords ([-1+1/n, 1-1/n] -> [0.5, n-0.5]).

    Reference: romatch/utils/utils.py:521-531 ``flow_to_pixel_coords``.
    """
    return jnp.stack(
        (w * (coords[..., 0] + 1) / 2, h * (coords[..., 1] + 1) / 2), axis=-1
    )


def to_normalized_coords(coords: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Pixel coords -> [-1,1] normalized (reference utils.py:535-545)."""
    return jnp.stack(
        (2 * coords[..., 0] / w - 1, 2 * coords[..., 1] / h - 1), axis=-1
    )


def warp_to_pixel_coords(warp: jnp.ndarray, h1: int, w1: int, h2: int, w2: int):
    """4-channel warp (x1,y1,x2,y2) to pixel coords (reference utils.py:549-570)."""
    return jnp.concatenate(
        (to_pixel_coords(warp[..., :2], h1, w1), to_pixel_coords(warp[..., 2:], h2, w2)),
        axis=-1,
    )
