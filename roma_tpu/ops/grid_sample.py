"""Bilinear / nearest grid sampling (torch ``F.grid_sample`` semantics).

JAX has no grid_sample primitive; this is the gather-based NHWC formulation.
The channel dimension stays contiguous in lanes so each sample is a vectorized
row gather — the layout XLA:TPU handles well.

Semantics pinned against torch in tests/test_ops.py:
  * ``align_corners=False`` (the only mode the reference uses):
    ``ix = (gx + 1) * W / 2 - 0.5``,
  * ``padding_mode='zeros'``: out-of-bounds *corners* contribute zero,
  * ``mode='nearest'``: round-half-to-even like torch.

Used everywhere the reference calls F.grid_sample: warp lookup
(matcher.py:132), tiny matcher (tiny.py:294,300), gt-warp depth sampling
(utils.py:399,439), keypoint transfer (matcher.py:743-754).
"""
from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(g: jnp.ndarray, n: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (g + 1) * (n - 1) / 2
    return (g + 1) * n / 2 - 0.5


def grid_sample(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Sample NHWC ``x`` (B, H, W, C) at ``grid`` (B, *S, 2) in [-1, 1] (x, y).

    Returns (B, *S, C). Interpolation weights are computed in float32; the
    gathered features keep their dtype.
    """
    b, h, w, c = x.shape
    spatial = grid.shape[1:-1]
    n = 1
    for s in spatial:
        n *= s
    g = grid.reshape(b, n, 2).astype(jnp.float32)
    ix = _unnormalize(g[..., 0], w, align_corners)
    iy = _unnormalize(g[..., 1], h, align_corners)

    x_flat = x.reshape(b, h * w, c)

    def gather(yi, xi):
        """Gather rows at integer (yi, xi) with zeros/border padding."""
        if padding_mode == "zeros":
            valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        else:  # border
            valid = None
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        idx = yc * w + xc  # (b, n)
        out = jnp.take_along_axis(x_flat, idx[..., None], axis=1)
        return out, valid

    if mode == "nearest":
        yi = jnp.round(iy).astype(jnp.int32)
        xi = jnp.round(ix).astype(jnp.int32)
        out, valid = gather(yi, xi)
        if valid is not None:
            out = out * valid[..., None].astype(out.dtype)
        return out.reshape(b, *spatial, c)

    if mode != "bilinear":
        raise ValueError(f"unsupported grid_sample mode: {mode}")

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = (ix - x0)[..., None]
    fy = (iy - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    acc = jnp.zeros((b, n, c), dtype=jnp.float32)
    for dy, dx, wgt in (
        (0, 0, (1 - fy) * (1 - fx)),
        (0, 1, (1 - fy) * fx),
        (1, 0, fy * (1 - fx)),
        (1, 1, fy * fx),
    ):
        val, valid = gather(y0 + dy, x0 + dx)
        if valid is not None:
            wgt = wgt * valid[..., None]
        acc = acc + val.astype(jnp.float32) * wgt
    return acc.astype(x.dtype).reshape(b, *spatial, c)
