"""Bilinear / nearest grid sampling (torch ``F.grid_sample`` semantics).

JAX has no grid_sample primitive; this is the gather-based NHWC formulation.

TPU performance note: XLA:TPU gathers cost ~constant time PER ROW (~140M
rows/s on v5e, nearly independent of row width up to ~100B). The bilinear
path therefore packs the four corner texels of every source position into
ONE table row (a 1-texel halo keeps edge clipping exact), turning 4 gathers
per output pixel into 1 — measured ~2x end-to-end on the RoMa refiners. The
packed table costs 4x the feature bytes, so it's used when C <= PACK_MAX_C;
wide-channel maps stay on the 4-tap path whose big rows already stream well.

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

import jax
import jax.numpy as jnp

PACK_MAX_C = 128
# per-image mapping threshold (see measured cliff notes below); tests patch it
BIG_TABLE_BYTES = 100 * 1024 * 1024


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

    if c <= PACK_MAX_C and padding_mode == "zeros":
        # XLA:TPU gather throughput collapses ~3-5x once the table exceeds
        # ~100 MB (measured v5e: 512B rows 82 -> 15 GB/s, 128B rows 28 -> 9
        # GB/s), so big batches map per-image to keep each packed table in
        # the fast regime. Sequential map steps cost ~us; the gathers are
        # tens of ms.
        # row width includes the pow2 pad_mid _bilinear_packed inserts for
        # non-power-of-two 4C widths — the real table can be ~2x 4C
        width = 4 * c
        if width > 32 and (width & (width - 1)) != 0:
            width = 1 << (width - 1).bit_length()
        table_bytes = b * (h + 1) * (w + 1) * width * x.dtype.itemsize
        if b > 1 and table_bytes > BIG_TABLE_BYTES:
            out = jax.lax.map(
                lambda args: _bilinear_packed(
                    args[0][None], args[1][None], args[2][None],
                    args[3][None], args[4][None],
                )[0],
                (x, y0, x0, fy, fx),
            )
            return out.reshape(b, *spatial, c)
        return _bilinear_packed(x, y0, x0, fy, fx).reshape(b, *spatial, c)

    def four_tap(x_flat, y0, x0, fy, fx):
        bb = x_flat.shape[0]
        acc = jnp.zeros((bb, y0.shape[1], c), dtype=jnp.float32)
        for dy, dx, wgt in (
            (0, 0, (1 - fy) * (1 - fx)),
            (0, 1, (1 - fy) * fx),
            (1, 0, fy * (1 - fx)),
            (1, 1, fy * fx),
        ):
            yi, xi = y0 + dy, x0 + dx
            if padding_mode == "zeros":
                wgt = wgt * ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))[..., None]
            idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            val = jnp.take_along_axis(x_flat, idx[..., None], axis=1)
            acc = acc + val.astype(jnp.float32) * wgt
        return acc.astype(x.dtype)

    # same big-table cliff as the packed path: map per-image past ~100 MB
    if b > 1 and x_flat.size * x.dtype.itemsize > BIG_TABLE_BYTES:
        out = jax.lax.map(
            lambda a: four_tap(
                a[0][None], a[1][None], a[2][None], a[3][None], a[4][None]
            )[0],
            (x_flat, y0, x0, fy, fx),
        )
        return out.reshape(b, *spatial, c)
    return four_tap(x_flat, y0, x0, fy, fx).reshape(b, *spatial, c)


def _bilinear_packed(x: jnp.ndarray, y0, x0, fy, fx) -> jnp.ndarray:
    """One gather per output pixel: corner-packed table with 1-texel halo.

    x: (B, H, W, C); y0/x0: (B, N) int corner bases; fy/fx: (B, N, 1) f32
    fractional weights. Zeros padding: out-of-bounds corners masked; the halo
    makes clipped base rows still hold the correct in-bounds corner texels.
    """
    b, h, w, c = x.shape
    n = y0.shape[1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    corners = (xp[:, :-1, :-1], xp[:, :-1, 1:], xp[:, 1:, :-1], xp[:, 1:, 1:])
    # XLA:TPU gather throughput craters for non-power-of-two row widths > 32
    # (36-wide rows run ~4x slower than 64-wide). Plain zero-padding on the
    # right gets stripped by XLA's gather-operand compaction (it slices the
    # table back to the used column prefix), so the pad goes BETWEEN the last
    # two corner groups: used columns then span [0, P) and cannot be narrowed.
    width = 4 * c
    pad_mid = 0
    if width > 32 and (width & (width - 1)) != 0:
        pad_mid = (1 << (width - 1).bit_length()) - width
    if pad_mid:
        zeros = jnp.zeros(xp[:, :-1, :-1].shape[:-1] + (pad_mid,), x.dtype)
        packed = jnp.concatenate(corners[:3] + (zeros, corners[3]), axis=-1)
    else:
        packed = jnp.concatenate(corners, axis=-1)
    packed = packed.reshape(b * (h + 1) * (w + 1), 4 * c + pad_mid)

    v00 = ((y0 >= 0) & (y0 < h) & (x0 >= 0) & (x0 < w))[..., None]
    v01 = ((y0 >= 0) & (y0 < h) & (x0 + 1 >= 0) & (x0 + 1 < w))[..., None]
    v10 = ((y0 + 1 >= 0) & (y0 + 1 < h) & (x0 >= 0) & (x0 < w))[..., None]
    v11 = ((y0 + 1 >= 0) & (y0 + 1 < h) & (x0 + 1 >= 0) & (x0 + 1 < w))[..., None]

    yc = jnp.clip(y0, -1, h - 1) + 1
    xc = jnp.clip(x0, -1, w - 1) + 1
    base = (jnp.arange(b, dtype=jnp.int32) * ((h + 1) * (w + 1)))[:, None]
    idx = base + yc * (w + 1) + xc
    rows = jnp.take(packed, idx.reshape(-1), axis=0)
    r00 = rows[:, 0 * c : 1 * c].reshape(b, n, c).astype(jnp.float32)
    r01 = rows[:, 1 * c : 2 * c].reshape(b, n, c).astype(jnp.float32)
    r10 = rows[:, 2 * c : 3 * c].reshape(b, n, c).astype(jnp.float32)
    r11 = rows[:, 3 * c + pad_mid :].reshape(b, n, c).astype(jnp.float32)

    w00 = (1 - fy) * (1 - fx) * v00
    w01 = (1 - fy) * fx * v01
    w10 = fy * (1 - fx) * v10
    w11 = fy * fx * v11
    out = r00 * w00 + r01 * w01 + r10 * w10 + r11 * w11
    return out.astype(x.dtype)
