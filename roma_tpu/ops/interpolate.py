"""Static-shape image resize as dense matrix products.

torch's ``F.interpolate`` (bilinear / bicubic / nearest / nearest-exact,
antialias=False) applies a separable filter with at most 4 taps per output
sample. On TPU the idiomatic formulation is two small dense matmuls
``out = R @ x @ C^T`` that run on the MXU with static shapes, instead of
gathers. The weight matrices are built on host once per (in, out, mode) and
cached.

Semantics match torch exactly (the reference uses these modes pervasively:
flow/certainty upsampling matcher.py:513-526, pos-embed interpolation
dinov2.py:166-190 (bicubic, scale_factor semantics), dataset depth resize
utils.py:223-230 (nearest-exact)). Parity is pinned by tests/test_ops.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (same coefficients as torch/OpenCV, a=-0.75)."""
    t = np.abs(t)
    out = np.where(
        t <= 1,
        ((a + 2) * t - (a + 3)) * t * t + 1,
        np.where(t < 2, (((t - 5) * t + 8) * t - 4) * a, 0.0),
    )
    return out


@functools.lru_cache(maxsize=256)
def _resize_matrix(
    in_size: int,
    out_size: int,
    mode: str,
    align_corners: bool = False,
    scale: float | None = None,
) -> np.ndarray:
    """(out_size, in_size) row-stochastic resize weights, float32.

    ``scale`` (out/in) overrides the size-derived scale to reproduce torch's
    ``scale_factor=...`` code path (used by DINOv2 pos-embed interpolation).
    """
    W = np.zeros((out_size, in_size), dtype=np.float64)
    o = np.arange(out_size, dtype=np.float64)
    if mode == "nearest":
        # legacy torch 'nearest': floor(o * in/out)
        idx = np.floor(o * in_size / out_size).astype(np.int64).clip(0, in_size - 1)
        W[np.arange(out_size), idx] = 1.0
        return W.astype(np.float32)
    if mode == "nearest-exact":
        idx = (
            np.floor((o + 0.5) * in_size / out_size)
            .astype(np.int64)
            .clip(0, in_size - 1)
        )
        W[np.arange(out_size), idx] = 1.0
        return W.astype(np.float32)

    if align_corners:
        if out_size == 1:
            src = np.zeros_like(o)
        else:
            src = o * (in_size - 1) / (out_size - 1)
    else:
        inv_scale = (1.0 / scale) if scale is not None else in_size / out_size
        src = (o + 0.5) * inv_scale - 0.5

    if mode in ("bilinear", "linear"):
        x0 = np.floor(src)
        f = src - x0
        taps = [(x0, 1 - f), (x0 + 1, f)]
    elif mode == "bicubic":
        x0 = np.floor(src)
        f = src - x0
        taps = [(x0 - 1 + k, _cubic_kernel(f - (k - 1))) for k in range(4)]
    else:
        raise ValueError(f"unsupported resize mode: {mode}")

    rows = np.arange(out_size)
    for idx, wgt in taps:
        idx = idx.astype(np.int64).clip(0, in_size - 1)  # border replicate at edges
        np.add.at(W, (rows, idx), wgt)
    return W.astype(np.float32)


def interpolate(
    x: jnp.ndarray,
    size: tuple[int, int],
    mode: str = "bilinear",
    align_corners: bool = False,
    scale_factor: tuple[float, float] | None = None,
) -> jnp.ndarray:
    """Resize NHWC ``x`` to ``size`` with torch ``F.interpolate`` semantics.

    The filter runs in float32 on the MXU and the result is cast back to the
    input dtype.
    """
    b, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w) and scale_factor is None:
        return x
    sr = scale_factor[0] if scale_factor is not None else None
    sc = scale_factor[1] if scale_factor is not None else None
    R = jnp.asarray(_resize_matrix(h, oh, mode, align_corners, sr))
    C = jnp.asarray(_resize_matrix(w, ow, mode, align_corners, sc))
    dtype = x.dtype
    hi = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,bhwc->bowc", R, x.astype(jnp.float32), precision=hi)
    y = jnp.einsum("ow,bhwc->bhoc", C, y, precision=hi)
    return y.astype(dtype)
