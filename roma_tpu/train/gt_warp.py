"""Ground-truth warp supervision from depth + pose (reference
romatch/utils/utils.py:325-454, ``get_gt_warp``/``warp_kpts``).

Unproject the image-A grid with depth A, rigidly transform, project into B;
valid where depth nonzero AND covisible AND relative depth error below
threshold. The reference computes in float64; on TPU we use f32 with
numerically careful formulations (explicit 3x3 inverse via solve, epsilon-
guarded division) — parity is pinned in tests/test_train.py against the
torch double implementation.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops import batched_grid, grid_sample


def warp_kpts(
    kpts0: jnp.ndarray,
    depth0: jnp.ndarray,
    depth1: jnp.ndarray,
    T_0to1: jnp.ndarray,
    K0: jnp.ndarray,
    K1: jnp.ndarray,
    depth_interpolation_mode: str = "bilinear",
    relative_depth_error_threshold: float = 0.05,
):
    """Warp normalized kpts0 (B, L, 2) from image 0 to image 1.

    depth0/1: (B, H, W); T_0to1: (B, 4, 4) or (B, 3, 4); K: (B, 3, 3).
    Returns (valid (B, L) bool, warped kpts (B, L, 2) normalized).
    """
    if depth_interpolation_mode == "combined":
        valid_b, warp_b = warp_kpts(
            kpts0, depth0, depth1, T_0to1, K0, K1, "bilinear",
            relative_depth_error_threshold,
        )
        valid_n, warp_n = warp_kpts(
            kpts0, depth0, depth1, T_0to1, K0, K1, "nearest-exact",
            relative_depth_error_threshold,
        )
        fill = (~valid_b) & valid_n
        warp = jnp.where(fill[..., None], warp_n, warp_b)
        return valid_b | valid_n, warp

    mode = "nearest" if "nearest" in depth_interpolation_mode else "bilinear"
    b, h, w = depth0.shape
    kpts0 = kpts0.astype(jnp.float32)

    d0 = grid_sample(depth0[..., None], kpts0[:, :, None], mode=mode)[:, :, 0, 0]
    nonzero = d0 != 0

    # normalized -> pixel coords ([-1+1/n, 1-1/n] -> [0.5, n-0.5])
    pix = jnp.stack(
        (w * (kpts0[..., 0] + 1) / 2, h * (kpts0[..., 1] + 1) / 2), axis=-1
    )
    homo = jnp.concatenate((pix, jnp.ones_like(pix[..., :1])), axis=-1) * d0[..., None]
    cam0 = jnp.linalg.solve(K0.astype(jnp.float32), jnp.swapaxes(homo, 1, 2))  # (B,3,L)

    R = T_0to1[:, :3, :3].astype(jnp.float32)
    t = T_0to1[:, :3, 3:4].astype(jnp.float32)
    cam1 = R @ cam0 + t
    depth_computed = cam1[:, 2, :]

    proj = jnp.swapaxes(K1.astype(jnp.float32) @ cam1, 1, 2)  # (B, L, 3)
    xy = proj[..., :2] / (proj[..., 2:3] + 1e-4)

    h1, w1 = depth1.shape[1:3]
    covisible = (
        (xy[..., 0] > 0) & (xy[..., 0] < w1 - 1) & (xy[..., 1] > 0) & (xy[..., 1] < h1 - 1)
    )
    xy_n = jnp.stack((2 * xy[..., 0] / w1 - 1, 2 * xy[..., 1] / h1 - 1), axis=-1)

    d1 = grid_sample(depth1[..., None], xy_n[:, :, None], mode=mode)[:, :, 0, 0]
    rel_err = jnp.abs((d1 - depth_computed) / jnp.where(d1 == 0, 1e-12, d1))
    consistent = rel_err < relative_depth_error_threshold
    return nonzero & covisible & consistent, xy_n


def get_gt_warp(
    depth1, depth2, T_1to2, K1, K2,
    depth_interpolation_mode: str = "bilinear",
    relative_depth_error_threshold: float = 0.05,
    H: int | None = None,
    W: int | None = None,
):
    """(B, H, W, 2) GT warp + (B, H, W) validity prob for supervision at
    resolution (H, W) (reference utils.py:325-353)."""
    b = depth1.shape[0]
    if H is None:
        _, H, W = depth1.shape
    grid = batched_grid(b, H, W).reshape(b, H * W, 2)
    mask, x2 = warp_kpts(
        grid, depth1, depth2, T_1to2, K1, K2,
        depth_interpolation_mode=depth_interpolation_mode,
        relative_depth_error_threshold=relative_depth_error_threshold,
    )
    return x2.reshape(b, H, W, 2), mask.astype(jnp.float32).reshape(b, H, W)
