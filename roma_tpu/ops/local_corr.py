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

Gather layout: XLA:TPU gathers cost ~constant time PER ROW almost
independent of width, so both methods fetch x-contiguous *runs* instead of
single texels. An im2col-style unfolded table U[y, xb] = src[y, xb-m-r :
xb-m-r+P] (x zero-padding baked in, margin m=r+2 so wholly-out-of-range
bases read all-zero rows) turns each (P x P) patch into P row reads — a P-x
cut in gather rows (6-8x here) for the same bytes, and removes all per-tap
x masking. Only the dy rows still need a validity mask.

Both are pure XLA with static shapes. Output is (B, H, W, K), K = (2r+1)^2,
ordered dy-major to match the reference channel order
(local_correlation.py:93-108).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _windowed_disabled() -> bool:
    """A/B switch: ROMA_DISABLE_TILE_WINDOW=1 forces the pure-XLA gather
    paths (used by the end-to-end validation harness and as an escape
    hatch); read at trace time."""
    return bool(int(os.environ.get("ROMA_DISABLE_TILE_WINDOW", "0")))


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


def _run_rows_and_mask(y0, x0, radius: int, h: int, w: int):
    """Row indices (n, P) into an unfolded (h*(w+2m)) runs table + dy mask.

    Row (y, xb) of the table holds the x-run starting at x = xb - m - radius;
    the margin m = radius+2 guarantees a clipped xb reads an all-zero row
    whenever the true base is outside [-m, w-1+m]: at xb = 0 the rightmost
    run texel sits at x = -m + 2*radius+1 = radius-1 < 0, and at xb = wt-1
    the leftmost sits at w-1+m-radius = w+1 >= w. Only dy validity remains.
    """
    p = 2 * radius + 2
    m = radius + 2
    wt = w + 2 * m
    u = jnp.arange(p, dtype=jnp.int32) - radius
    yy = y0[:, None] + u[None, :]  # (n, P)
    valid_y = (yy >= 0) & (yy < h)
    xb = jnp.clip(x0 + m, 0, wt - 1)
    rows = jnp.clip(yy, 0, h - 1) * wt + xb[:, None]
    return rows, valid_y


def _unfold_runs(src, radius: int):
    """src (..., H, W, C) -> (..., H*(W+2m), P*C) im2col runs table.

    Table row (y, xb) = src[y, xb-m-r : xb-m-r+P] with x zero padding baked
    in (P = 2r+2, m = r+2). Costs a P-x transient of src; buys gathers that
    read P texels per row instead of 1.
    """
    p = 2 * radius + 2
    m = radius + 2
    h, w, c = src.shape[-3:]
    lead = src.shape[:-3]
    # run col j at base xb: src_x = xb - m - radius + j; with left pad
    # L = m + radius the padded index is xb + j. Right pad covers j = P-1
    # at xb = w + 2m - 1.
    pads = ((0, 0),) * len(lead) + ((0, 0), (m + radius, m + radius + 2), (0, 0))
    sp = jnp.pad(src, pads)
    wt = w + 2 * m
    cols = [
        jax.lax.slice_in_dim(sp, j, j + wt, axis=len(lead) + 1) for j in range(p)
    ]
    table = jnp.concatenate(cols, axis=-1)
    return table.reshape(*lead, h * wt, p * c)


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
    # The P-x runs-unfold of the (n, h, w) volume cuts gather rows by P but
    # costs a P-x f32 transient; past ~256 MB the extra HBM traffic loses
    # more than the row cut wins (measured v5e: n=1225 4x faster, n=4900
    # 30% slower). Large volumes fall back to per-texel rows.
    if n * h * (w + 2 * (radius + 2)) * p * 4 <= 256 * 1024 * 1024:
        rows, valid_y = _run_rows_and_mask(y0, x0, radius, h, w)
        table = _unfold_runs(d_full.reshape(n, h, w)[..., None], radius)
        dpatch = jnp.take_along_axis(table, rows[:, :, None], axis=1)  # (n,P,P)
        dpatch = dpatch * valid_y[:, :, None].astype(jnp.float32)
    else:
        u = jnp.arange(p, dtype=jnp.int32) - radius
        yy = y0[:, None, None] + u[None, :, None]
        xx = x0[:, None, None] + u[None, None, :]
        valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
        dpatch = jnp.take_along_axis(d_full, idx.reshape(n, p * p), axis=1)
        dpatch = dpatch.reshape(n, p, p) * valid.astype(jnp.float32)
    corr = _combine_corners(dpatch, fy[:, None, None], fx[:, None, None])
    return corr.reshape(h, w, (2 * radius + 1) ** 2)


def _local_corr_patch_single(
    f0, f1, warp, radius: int, pixel_chunk: int = 2048, with_lookup: bool = False
):
    """Per-image core gathering feature-run rows from an unfolded table.

    Per pixel: P row reads of width P*C (one per dy) from the runs table,
    then one f32 matvec with feature0 and the 4-corner combine. The gather
    transient is bounded by chunking pixels with lax.map; the table itself
    (P x the feature bytes) is built once per image.

    ``with_lookup``: also return the bilinear warp lookup of f1 (identical
    to ``grid_sample(f1, warp)``) — its four corner vectors are the center
    2x2 of the patch already in registers, so the matcher's separate x_hat
    gather (matcher.py x_hat = grid_sample(y, flow)) comes for free.
    """
    h, w, c = f0.shape
    n = h * w
    p = 2 * radius + 2
    y0, x0, fy, fx = _base_indices(warp.reshape(n, 2), h, w)
    f0_flat = f0.reshape(n, c).astype(jnp.float32) / jnp.sqrt(jnp.float32(c))
    # Runs-table rows are P*C wide; XLA:TPU gathers sustain ~80 GB/s only
    # for power-of-two row widths >= ~2 KB (measured v5e; 1536-element rows
    # run at roughly half that). Non-pow2 shapes keep per-texel C-wide rows.
    pc = p * c
    use_runs = pc * f1.dtype.itemsize >= 4096 and (pc & (pc - 1)) == 0
    table = _unfold_runs(f1, radius) if use_runs else f1.reshape(n, c)

    def chunk_fn(args):
        y0c, x0c, fyc, fxc, f0c = args
        m = y0c.shape[0]
        if use_runs:
            rows, valid_y = _run_rows_and_mask(y0c, x0c, radius, h, w)
            runs = jnp.take(table, rows.reshape(m * p), axis=0).reshape(m, p, p, c)
            dpatch = jnp.einsum(
                "nuvc,nc->nuv",
                runs.astype(jnp.float32),
                f0c,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            dpatch = dpatch * valid_y[:, :, None].astype(jnp.float32)
            if with_lookup:
                # center 2x2 corners, y-masked (x handled by the runs table)
                ctr = runs[:, radius : radius + 2, radius : radius + 2, :]
                ctr = ctr * valid_y[:, radius : radius + 2, None, None].astype(
                    ctr.dtype
                )
        else:
            u = jnp.arange(p, dtype=jnp.int32) - radius
            yy = y0c[:, None, None] + u[None, :, None]
            xx = x0c[:, None, None] + u[None, None, :]
            valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
            patch = jnp.take(table, idx.reshape(m * p * p), axis=0).reshape(
                m, p * p, c
            )
            patch = patch * valid.reshape(m, p * p, 1).astype(patch.dtype)
            if with_lookup:
                ctr = patch.reshape(m, p, p, c)[
                    :, radius : radius + 2, radius : radius + 2, :
                ]
            dpatch = jnp.einsum(
                "nkc,nc->nk",
                patch.astype(jnp.float32),
                f0c,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(m, p, p)
        corr = _combine_corners(dpatch, fyc[:, None, None], fxc[:, None, None])
        if not with_lookup:
            return corr
        wy, wx = fyc[:, None], fxc[:, None]
        xh = (
            ctr[:, 0, 0].astype(jnp.float32) * (1 - wy) * (1 - wx)
            + ctr[:, 0, 1].astype(jnp.float32) * (1 - wy) * wx
            + ctr[:, 1, 0].astype(jnp.float32) * wy * (1 - wx)
            + ctr[:, 1, 1].astype(jnp.float32) * wy * wx
        )
        return corr, xh.astype(f1.dtype)

    k = (2 * radius + 1) ** 2
    if n <= pixel_chunk:
        out = chunk_fn((y0, x0, fy, fx, f0_flat))
        if with_lookup:
            return out[0].reshape(h, w, k), out[1].reshape(h, w, c)
        return out.reshape(h, w, k)

    pad = (-n) % pixel_chunk
    def padded(a):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1)).reshape(
            -1, pixel_chunk, *a.shape[1:]
        )
    out = jax.lax.map(
        chunk_fn, (padded(y0), padded(x0), padded(fy), padded(fx), padded(f0_flat))
    )
    if with_lookup:
        corr = out[0].reshape(-1, k)[:n].reshape(h, w, k)
        xh = out[1].reshape(-1, c)[:n].reshape(h, w, c)
        return corr, xh
    return out.reshape(-1, k)[:n].reshape(h, w, k)


def local_correlation(
    f0: jnp.ndarray,
    f1: jnp.ndarray,
    radius: int,
    warp: jnp.ndarray,
    method: str = "auto",
    batch_chunk: int | None = None,
    return_lookup: bool = False,
    inference: bool = False,
):
    """Windowed local correlation.

    Args:
      f0, f1: (B, H, W, C) features (A-frame queries / B-frame targets).
      radius: window radius r; output has K = (2r+1)^2 channels.
      warp: (B, H, W, 2) predicted A->B warp in normalized coords.
      method: 'corrvol' | 'patch' | 'windowed' | 'auto'. Auto picks the
        Pallas windowed-tile kernel (ops/tile_window.py) on TPU inference
        (measured 2.5-4x over the gather paths at the fine scales, v5e),
        the corrvol matmul for small maps, the patch gather otherwise.
      batch_chunk: images per lax.map chunk (bounds transient HBM); default
        derived from the per-image working-set size.
      return_lookup: also return ``grid_sample(f1, warp)`` computed from the
        patch corners already gathered — free on the patch method; None on
        the corrvol method (the volume holds dots, not feature vectors).
      inference: no gradients needed — enables the Pallas windowed kernel
        (forward-only; training keeps the differentiable XLA paths).

    Returns (B, H, W, K) in f0's dtype; with ``return_lookup``, a tuple
    (corr, x_hat-or-None).
    """
    b, h, w, c = f0.shape
    n = h * w
    if method == "auto":
        # return_lookup only exists on the patch method (the corrvol holds
        # dots, not feature vectors) — don't let auto silently drop x_hat
        if return_lookup:
            method = "patch"
        elif (
            inference
            and radius <= 4
            and n >= 4000
            and jax.default_backend() == "tpu"
            and not _windowed_disabled()
        ):
            method = "windowed"
        else:
            method = "corrvol" if n <= 5000 else "patch"
    if method == "windowed":
        from .tile_window import windowed_local_corr

        corr = windowed_local_corr(f0, f1, radius, warp)
        return (corr, None) if return_lookup else corr
    if method == "corrvol":
        core = _local_corr_corrvol_single
        lookup = False
    else:
        lookup = return_lookup
        core = functools.partial(_local_corr_patch_single, with_lookup=lookup)
    if batch_chunk is None:
        p = 2 * radius + 2
        runs = p * c * f1.dtype.itemsize >= 4096 and ((p * c) & (p * c - 1)) == 0
        per_image = (
            n * n * 4 if method == "corrvol"
            else n * p * c * 8 if runs        # runs-table + gather transient
            else n * p * p * c * 4            # per-texel patch transient
        )
        budget = 512 * 1024 * 1024
        batch_chunk = max(1, min(b, budget // max(per_image, 1)))

    # jax.checkpoint per map chunk: without it, AD saves each chunk's
    # gathered-patch residuals across the whole scan (n*p^2*c per image —
    # ~16 GB over the coarse scales at bs16 560^2, the dominant training
    # buffer), defeating the transient budget. With it, backward recomputes
    # one chunk at a time, so the 512 MB budget bounds bwd too. Free at
    # inference (no residuals without grads).
    out = jax.lax.map(
        jax.checkpoint(lambda args: core(*args, radius)),
        (f0, f1, warp),
        batch_size=min(batch_chunk, b),
    )
    if not return_lookup:
        return jax.tree.map(lambda a: a.astype(f0.dtype), out) if lookup else out.astype(f0.dtype)
    if lookup:
        corr, xh = out
        return corr.astype(f0.dtype), xh
    return out.astype(f0.dtype), None


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
