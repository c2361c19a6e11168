"""Windowed local correlation — TPU-native replacement for the reference's
``fused-local-corr`` CUDA extension (romatch/utils/local_correlation.py).

Semantics (the torch fallback ``shitty_native_torch_local_corr`` is the spec):
for every query pixel i with predicted warp w(i), take a (2r+1)^2 grid of
points spaced exactly one feature-pixel apart around w(i) in image B,
bilinearly sample feature1 there (zeros padding), and dot with feature0[i]
scaled by 1/sqrt(C).

Key structural fact exploited here: the window offsets are *integer pixel*
shifts, so all (2r+1)^2 taps share one bilinear fractional weight and their
corners tile a (2r+2)^2 integer patch. That turns the op into:

  corrvol method (coarse scales, small HW):
      one MXU matmul  D = f0 @ f1^T / sqrt(C)   (the full correlation volume)
      + one small gather of the (2r+2)^2 patch of D per pixel
      + a 4-corner weighted combine with static slices.

  patch method (fine scales, big HW, where the HW x HW volume is too large):
      gather the (2r+2)^2 x C patch of feature1 per pixel
      + a batched matvec with feature0
      + the same 4-corner combine.

Both are pure XLA with static shapes. Output is (B, H, W, K), K = (2r+1)^2,
ordered dy-major to match the reference channel order
(local_correlation.py:93-108).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _combine_corners(dpatch: jnp.ndarray, fy: jnp.ndarray, fx: jnp.ndarray):
    """dpatch (..., P, P) corner dots -> (..., K) bilinear taps, K=(P-1)^2.

    fy/fx are the shared fractional offsets, shaped to broadcast against
    dpatch[..., :-1, :-1].
    """
    w00 = (1 - fy) * (1 - fx)
    w01 = (1 - fy) * fx
    w10 = fy * (1 - fx)
    w11 = fy * fx
    out = (
        w00 * dpatch[..., :-1, :-1]
        + w01 * dpatch[..., :-1, 1:]
        + w10 * dpatch[..., 1:, :-1]
        + w11 * dpatch[..., 1:, 1:]
    )
    s = out.shape
    return out.reshape(*s[:-2], s[-2] * s[-1])


def _base_indices(warp: jnp.ndarray, h: int, w: int):
    """Unnormalize warp (..., 2) to pixel coords; return y0, x0 (int), fy, fx."""
    wf = warp.astype(jnp.float32)
    ix = (wf[..., 0] + 1) * w / 2 - 0.5
    iy = (wf[..., 1] + 1) * h / 2 - 0.5
    x0f = jnp.floor(ix)
    y0f = jnp.floor(iy)
    return (
        y0f.astype(jnp.int32),
        x0f.astype(jnp.int32),
        iy - y0f,
        ix - x0f,
    )


def _patch_index_and_mask(y0, x0, radius: int, h: int, w: int):
    """Flat indices (n, P, P) into an (h*w) map + validity mask (zeros padding)."""
    p = 2 * radius + 2
    u = jnp.arange(p, dtype=jnp.int32) - radius
    yy = y0[:, None, None] + u[None, :, None]  # (n, P, 1)
    xx = x0[:, None, None] + u[None, None, :]  # (n, 1, P)
    valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
    idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
    return idx, valid


def _local_corr_corrvol_single(f0, f1, warp, radius: int):
    """Per-image core. f0, f1: (H, W, C); warp: (H, W, 2). Returns (H, W, K)."""
    h, w, c = f0.shape
    n = h * w
    p = 2 * radius + 2
    d_full = jnp.einsum(
        "ic,jc->ij",
        f0.reshape(n, c).astype(jnp.float32) / jnp.sqrt(jnp.float32(c)),
        f1.reshape(n, c).astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (n, n) on the MXU
    y0, x0, fy, fx = _base_indices(warp.reshape(n, 2), h, w)
    idx, valid = _patch_index_and_mask(y0, x0, radius, h, w)
    dpatch = jnp.take_along_axis(d_full, idx.reshape(n, p * p), axis=1)
    dpatch = dpatch.reshape(n, p, p) * valid.astype(jnp.float32)
    corr = _combine_corners(dpatch, fy[:, None, None], fx[:, None, None])
    return corr.reshape(h, w, (2 * radius + 1) ** 2)


def _local_corr_patch_single(f0, f1, warp, radius: int, pixel_chunk: int = 2048):
    """Per-image core gathering feature patches instead of the corr volume.

    The (n, p^2, C) patch gather is the memory hot spot at fine scales
    (e.g. 864/8 -> n=11664, p=8, C=512); chunk over pixels with lax.map so
    the transient stays ~pixel_chunk * p^2 * C * 4 bytes.
    """
    h, w, c = f0.shape
    n = h * w
    p = 2 * radius + 2
    y0, x0, fy, fx = _base_indices(warp.reshape(n, 2), h, w)
    f1_flat = f1.reshape(n, c)
    f0_flat = f0.reshape(n, c).astype(jnp.float32) / jnp.sqrt(jnp.float32(c))

    def chunk_fn(args):
        y0c, x0c, fyc, fxc, f0c = args
        idx, valid = _patch_index_and_mask(y0c, x0c, radius, h, w)
        m = y0c.shape[0]
        patch = jnp.take(f1_flat, idx.reshape(m * p * p), axis=0).reshape(m, p * p, c)
        patch = patch * valid.reshape(m, p * p, 1).astype(patch.dtype)
        dpatch = jnp.einsum(
            "nkc,nc->nk",
            patch.astype(jnp.float32),
            f0c,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(m, p, p)
        return _combine_corners(dpatch, fyc[:, None, None], fxc[:, None, None])

    if n <= pixel_chunk:
        corr = chunk_fn((y0, x0, fy, fx, f0_flat))
        return corr.reshape(h, w, (2 * radius + 1) ** 2)

    pad = (-n) % pixel_chunk
    def padded(a):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)).reshape(
            -1, pixel_chunk, *a.shape[1:]
        )
    corr = jax.lax.map(
        chunk_fn, (padded(y0), padded(x0), padded(fy), padded(fx), padded(f0_flat))
    ).reshape(-1, (2 * radius + 1) ** 2)[:n]
    return corr.reshape(h, w, (2 * radius + 1) ** 2)


def local_correlation(
    f0: jnp.ndarray,
    f1: jnp.ndarray,
    radius: int,
    warp: jnp.ndarray,
    method: str = "auto",
    batch_chunk: int | None = None,
) -> jnp.ndarray:
    """Windowed local correlation.

    Args:
      f0, f1: (B, H, W, C) features (A-frame queries / B-frame targets).
      radius: window radius r; output has K = (2r+1)^2 channels.
      warp: (B, H, W, 2) predicted A->B warp in normalized coords.
      method: 'corrvol' | 'patch' | 'auto' (auto picks corrvol for small maps).
      batch_chunk: images per lax.map chunk (bounds transient HBM); default
        derived from the per-image working-set size.

    Returns (B, H, W, K) in f0's dtype.
    """
    b, h, w, c = f0.shape
    n = h * w
    if method == "auto":
        method = "corrvol" if n <= 5000 else "patch"
    core = (
        _local_corr_corrvol_single if method == "corrvol" else _local_corr_patch_single
    )
    if batch_chunk is None:
        per_image = (
            n * n * 4 if method == "corrvol" else n * (2 * radius + 2) ** 2 * c * 4
        )
        budget = 512 * 1024 * 1024
        batch_chunk = max(1, min(b, budget // max(per_image, 1)))

    out = jax.lax.map(
        lambda args: core(*args, radius),
        (f0, f1, warp),
        batch_size=min(batch_chunk, b),
    )
    return out.astype(f0.dtype)


def corr_volume(f0: jnp.ndarray, f1: jnp.ndarray) -> jnp.ndarray:
    """Global all-pairs correlation (tiny RoMa, reference tiny.py:178-191).

    f0, f1: (B, H, W, C). Returns (B, H1, W1, H0, W0) = <f1_j, f0_i>/sqrt(C),
    matching the reference's (B, H1, W1, H0, W0) layout.
    """
    b, h0, w0, c = f0.shape
    _, h1, w1, _ = f1.shape
    v = jnp.einsum(
        "bjc,bic->bji",
        f1.reshape(b, h1 * w1, c).astype(jnp.float32),
        f0.reshape(b, h0 * w0, c).astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) / jnp.sqrt(jnp.float32(c))
    return v.reshape(b, h1, w1, h0, w0)
