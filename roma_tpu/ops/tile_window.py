"""Windowed tile sampler v2 — production path for the matcher's scale-1
warp lookups (and the shared planning layer for windowed kernels).

Replaces the staging design in ``graveyard/window_warp_v1.py`` (kept as the
documented v1 experiment). Same idea — a 64x64 query tile's bilinear
targets cluster in a small window, so the scattered gather becomes dense
MXU/VPU work on a VMEM-resident window — but four structural changes,
each driven by round-2/3 measurements (tools/profile_window.py):

  1. **No unfold.** The feature map is zero-padded and reshaped (pure
     reshape) into an x-segment table; v1 materialized a 3x-duplicated
     unfolded copy first. The corr kernel DMAs its windows HBM->VMEM
     directly (double-buffered, scalar-prefetched per-tile origins, a
     (nc, B, Hp, NJ, XQ, cc) table whose sliced dims are all leading);
     the warp kernel gathers window rows XLA-side instead — its C=9
     channel count cannot fill whole (8, 128) trailing tiles without
     padding waste, and the in-kernel-DMA variants either tripped
     Mosaic's trailing-tiled-dim rules or compiled pathologically
     (see _warp_kernel notes).
  2. **Bounded-influence window origins.** v1 centered windows on the raw
     mean target; far out-of-image flows (sky, occlusion -> |flow| >> 1)
     dragged the mean so badly that most queries missed their window
     (measured mean 958 misses/tile on realistic flows). Coordinates are
     clipped into the padded range before averaging, so outliers saturate
     instead of dragging.
  3. **Misses that need fixing = out-of-window AND touching the image.**
     A query whose whole bilinear footprint is out of image has value 0
     (grid_sample zeros padding) — the kernel's in-window mask already
     yields 0, no fixup slot needed. This one change cut over-budget
     tiles 96% -> 11% on adversarial flows (measured).
  4. **Per-tile overflow budget, not whole-batch fallback.** Tiles with
     more than ``kf`` fixable misses (up to ``nt_bad`` of them) are
     recomputed exactly by a bounded 4-tap gather and scattered over the
     kernel output; the whole-batch lean-gather fallback only remains for
     the pathological case of more than ``nt_bad`` such tiles.

Exactness: every query is either (a) in-window -> exact bilinear one-hot
contraction over the zero-padded window, (b) fixed up in-kernel from
exactly-gathered 4-tap values, (c) fully out of image -> 0, or (d) in an
over-budget tile -> recomputed by the plain 4-tap formula. All four match
``grid_sample(mode='bilinear', padding_mode='zeros',
align_corners=False)`` bit-for-bit in f32 accumulation (torch parity is
pinned in tests/test_tile_window.py).

Reference semantics being replaced: the x_hat warp lookup
(/root/reference/romatch/models/matcher.py:132) at the fine decoder
scales.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grid_sample import grid_sample
from .local_corr import _combine_corners
from .window_util import _compact_miss, _query_subblock


@dataclass(frozen=True)
class WarpSpec:
    # Small tiles on purpose: 64^2-query tiles concentrated enough misses
    # under adversarial warps (speckle outliers, discontinuities) to blow
    # any per-tile budget and trip the whole-batch fallback (~160 fixable
    # misses/tile measured at 864^2), and their windows cost 3-4x more MXU
    # per query. 16^2 tiles bound the damage per tile — same recipe that
    # made the corr kernel robust.
    th: int = 16        # query tile height
    tw: int = 16        # query tile width
    wh: int = 64        # window rows
    xq: int = 64        # x segment quantum (window origin granularity)
    ns: int = 2         # segments per window; window cols ww = ns*xq
    pm: int = 32        # zero-pad margin around the image
    kf: int = 32        # per-tile in-kernel fixup slots
    nt_bad: int = 64    # min over-budget tiles recomputed exactly per batch
    dots: str = "bf16x2"  # 'bf16x2' (two exact 0/1 dots) or 'f32'

    @property
    def t(self) -> int:
        return self.th * self.tw

    @property
    def ww(self) -> int:
        return self.ns * self.xq


def _tile_fields(a, hq, wq, th, tw):
    """(B, Hq*Wq) -> (B, nt, T) tile-major (edge-padded partial tiles)."""
    b = a.shape[0]
    a = a.reshape(b, hq, wq)
    ph, pw = (-hq) % th, (-wq) % tw
    if ph or pw:
        a = jnp.pad(a, ((0, 0), (0, ph), (0, pw)), mode="edge")
    nh, nw = a.shape[1] // th, a.shape[2] // tw
    a = a.reshape(b, nh, th, nw, tw).transpose(0, 1, 3, 2, 4)
    return a.reshape(b, nh * nw, th * tw), (nh, nw)


def _exact_taps(x_flat, img_rows, y0, x0, fy, fx, h, w, c):
    """Masked 4-tap bilinear from flat (B*H*W, C) rows; all args (..., )
    index arrays in ORIGINAL image coords. Returns (..., C) f32."""
    acc = jnp.zeros(y0.shape + (c,), jnp.float32)
    fy = fy[..., None]
    fx = fx[..., None]
    for dy, dx, wgt in (
        (0, 0, (1 - fy) * (1 - fx)),
        (0, 1, (1 - fy) * fx),
        (1, 0, fy * (1 - fx)),
        (1, 1, fy * fx),
    ):
        yy, xx = y0 + dy, x0 + dx
        v = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        rows = img_rows + jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
        vals = jnp.take(x_flat, rows.reshape(-1), axis=0).reshape(rows.shape + (c,))
        acc = acc + vals.astype(jnp.float32) * (wgt * v[..., None])
    return acc


def _warp_kernel(
    yl_ref, fy_ref, xl_ref, fx_ref, fpos_ref, fval_ref,  # VMEM per-tile
    win_ref,                     # VMEM (1, wh, ns*xqc) [x][c]-major window
    o_ref,                       # VMEM (1, C, T)
    *, spec: WarpSpec, c: int, qs: int,
):
    """Per-tile windowed bilinear sampling.

    Windows are gathered XLA-side (one wide row per (tile, window-row,
    segment) from the flat segment table — the fast per-row gather regime)
    and arrive as a regular VMEM-blocked input. An in-kernel DMA variant
    (scalar-prefetched origins, (Hp/8, 8, xqc) table) was built and either
    tripped Mosaic layout rules (dynamic indexing / partial tiles on the
    trailing tiled dims) or compiled pathologically slowly (>40 min);
    the XLA gather costs ~20 ms/batch more at 864^2 and compiles in
    minutes, so it is the production path.

    Per query block: two exact bf16 0/1 one-hot dots against the window
    rows (y corners; f32 weights applied after — identical arithmetic to
    the plain gather's f32 4-corner combine), a per-segment x-selection,
    and a one-hot scatter of the pre-gathered exact fixup values.
    """
    wh, xq, ns, t, kf = spec.wh, spec.xq, spec.ns, spec.t, spec.kf
    nq = t // qs
    xqc = xq * c

    f32 = jnp.float32

    def body(qb, _):
        sl = pl.ds(qb * qs, qs)
        yl = yl_ref[0, :, sl]          # (1, qs) int32
        fy = fy_ref[0, :, sl]          # (1, qs) f32
        xl = xl_ref[0, :, sl]
        fx = fx_ref[0, :, sl]

        # in-kernel exact fixup (sentinel slots carry pos = T, never match)
        fpos = fpos_ref[0]             # (KF, 1)
        fval = fval_ref[0]             # (KF, C)
        qi = jax.lax.broadcasted_iota(jnp.int32, (kf, qs), 1) + qb * qs
        onehot = (qi == fpos).astype(f32)
        fix = jax.lax.dot_general(
            fval, onehot, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )  # (C, qs)

        ok = (yl >= 0) & (yl <= wh - 2) & (xl >= 0) & (xl <= spec.ww - 2)

        ri = jax.lax.broadcasted_iota(jnp.int32, (wh, qs), 0)
        if spec.dots == "bf16x2":
            my0 = (ri == yl).astype(jnp.bfloat16)
            my1 = (ri == yl + 1).astype(jnp.bfloat16)
            my = None
        else:
            my = jnp.where(ri == yl, 1.0 - fy, 0.0) + jnp.where(
                ri == yl + 1, fy, 0.0
            )

        # static unroll over segments: contiguous 128-aligned minor slices
        acc = jnp.zeros((c, qs), f32)
        for s in range(ns):
            w_s = win_ref[0, :, pl.ds(s * xqc, xqc)]   # (wh, xqc)
            if spec.dots == "bf16x2":
                t0 = jax.lax.dot_general(
                    w_s, my0, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
                t1 = jax.lax.dot_general(
                    w_s, my1, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
                tm = t0 * (1.0 - fy) + t1 * fy      # (xqc, qs)
            else:
                tm = jax.lax.dot_general(
                    w_s.astype(f32), my, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
            tm3 = tm.reshape(xq, c, qs)             # leading split only
            ci = jax.lax.broadcasted_iota(jnp.int32, (xq, qs), 0) + s * xq
            sx = jnp.where(ci == xl, 1.0 - fx, 0.0) + jnp.where(
                ci == xl + 1, fx, 0.0
            )
            acc = acc + jnp.sum(tm3 * sx[:, None, :], axis=0)

        out = jnp.where(ok, acc, 0.0) + fix
        o_ref[0, :, sl] = out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nq, body, 0)


def _plan(flow, h, w, spec, radius: int = 0, oy_quant: int = 1):
    """Shared windowing plan: tile-major index fields, window origins,
    in-window tests and the needs-fix mask (miss AND touches image).

    ``radius``: extra in-window margin for kernels that read an integer
    (2r+2)^2 tap patch around each base (windowed local correlation);
    0 for the plain bilinear warp lookup. ``oy_quant``: window y-origin
    granularity (8 for kernels whose tables pre-split rows into 8-row
    tiles).
    """
    b = flow.shape[0]
    hq, wq = flow.shape[1], flow.shape[2]
    n = hq * wq
    th, tw, wh, xq, ns, pm = spec.th, spec.tw, spec.wh, spec.xq, spec.ns, spec.pm
    ww = spec.ww

    g = flow.reshape(b, n, 2).astype(jnp.float32)
    ix = (g[..., 0] + 1) * w / 2 - 0.5
    iy = (g[..., 1] + 1) * h / 2 - 0.5
    x0f, y0f = jnp.floor(ix), jnp.floor(iy)
    fx, fy = ix - x0f, iy - y0f
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    y0t, (nh, nw) = _tile_fields(y0, hq, wq, th, tw)
    x0t, _ = _tile_fields(x0, hq, wq, th, tw)
    fyt, _ = _tile_fields(fy, hq, wq, th, tw)
    fxt, _ = _tile_fields(fx, hq, wq, th, tw)
    nt = nh * nw

    hp = h + 2 * pm
    wpx = -(-(w + 2 * pm) // xq) * xq
    njq = wpx // xq

    # bounded-influence origins: clip into the padded range BEFORE the mean
    ypc = jnp.clip(y0t + pm, 0, hp - 1).astype(jnp.float32)
    xpc = jnp.clip(x0t + pm, 0, wpx - 1).astype(jnp.float32)
    oy = jnp.round(jnp.mean(ypc, axis=-1) - wh / 2).astype(jnp.int32)
    if oy_quant > 1:
        # nearest multiple, not floor: floor-quantization eats up to
        # oy_quant-1 of the window's bottom slack (at rb=16/wh=48 that
        # pushed ~1/3 of smooth-warp tiles into the miss fallback —
        # measured v5e, 672^2 C=64); nearest halves the worst case.
        # Correctness is origin-independent (miss fixups + fallback).
        oy = ((oy + oy_quant // 2) // oy_quant) * oy_quant
    oy = jnp.clip(oy, 0, ((hp - wh) // oy_quant) * oy_quant)
    jx = jnp.clip(
        jnp.round((jnp.mean(xpc, axis=-1) - ww / 2) / xq).astype(jnp.int32),
        0,
        njq - ns,
    )

    yl = (y0t + pm) - oy[..., None]
    xl = (x0t + pm) - (jx * xq)[..., None]
    r = radius
    inw = (
        (yl >= r) & (yl <= wh - 2 - r) & (xl >= r) & (xl <= ww - 2 - r)
    )
    touches = (
        (y0t >= -1 - r) & (y0t <= h - 1 + r)
        & (x0t >= -1 - r) & (x0t <= w - 1 + r)
    )
    needfix = ~inw & touches
    counts = jnp.sum(needfix, axis=-1)  # (B, nt)

    return dict(
        b=b, hq=hq, wq=wq, nt=nt, nh=nh, nw=nw, hp=hp, wpx=wpx, njq=njq,
        y0t=y0t, x0t=x0t, fyt=fyt, fxt=fxt, yl=yl, xl=xl,
        oy=oy, jx=jx, needfix=needfix, counts=counts,
    )


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def windowed_warp(
    x: jnp.ndarray,
    flow: jnp.ndarray,
    spec: WarpSpec = WarpSpec(),
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact ``grid_sample(x, flow)`` (bilinear, zeros, align_corners=False)
    via the windowed tile kernel. x (B,H,W,C); flow (B,Hq,Wq,2) in [-1,1].
    """
    b, h, w, c = x.shape
    hq, wq = flow.shape[1], flow.shape[2]
    th, tw, wh, xq, ns, pm, kf = (
        spec.th, spec.tw, spec.wh, spec.xq, spec.ns, spec.pm, spec.kf
    )
    ww, t = spec.ww, spec.t

    if h + 2 * pm < wh or -(-(w + 2 * pm) // xq) * xq < ww + xq:
        return grid_sample(x, flow)  # image smaller than a window

    p = _plan(flow, h, w, spec)
    nt, nh, nw, hp, wpx, njq = p["nt"], p["nh"], p["nw"], p["hp"], p["wpx"], p["njq"]
    bnt = b * nt

    # flat segment table: pure pad + reshape (no unfold, no transpose);
    # window rows are gathered XLA-side as (bnt, wh, ns) wide rows of xqc
    # (the per-row gather regime that sustains ~80 GB/s). Channels pad so
    # xqc is a 128 multiple (the kernel takes static 128-aligned minor
    # slices per segment).
    import math as _math

    cp_unit = 128 // _math.gcd(xq, 128)
    cp = -(-c // cp_unit) * cp_unit
    xqc = xq * cp
    xpad = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - c))) if cp != c else x
    xp = jnp.pad(xpad, ((0, 0), (pm, pm), (pm, wpx - w - pm), (0, 0)))
    table = xp.reshape(b, hp * njq, xqc)
    rows = (
        (p["oy"][..., None, None] + jnp.arange(wh)[None, None, :, None]) * njq
        + p["jx"][..., None, None]
        + jnp.arange(ns)[None, None, None, :]
    )  # (B, nt, wh, ns)
    table_flat = table.reshape(b * hp * njq, xqc)
    rows_g = rows + (jnp.arange(b, dtype=jnp.int32) * (hp * njq))[:, None, None, None]
    rows_g = rows_g.reshape(bnt, wh * ns)

    # fixup slots: compact the needs-fix queries, gather their exact taps
    fpos = _compact_miss(
        p["needfix"].reshape(bnt, 1, t), t, kf, interpret=interpret
    )  # (bnt, KF, 1)
    sel = jnp.minimum(fpos[:, :, 0], t - 1)
    x_flat = x.reshape(b * h * w, c)
    img_rows_f = (jnp.arange(bnt, dtype=jnp.int32) // nt * (h * w))[:, None]

    def tap_at(sel_idx, src_t):
        return jnp.take_along_axis(src_t.reshape(bnt, t), sel_idx, axis=1)

    fy_k = tap_at(sel, p["fyt"])
    fx_k = tap_at(sel, p["fxt"])
    y0_k = tap_at(sel, p["y0t"])
    x0_k = tap_at(sel, p["x0t"])
    fval = _exact_taps(x_flat, img_rows_f, y0_k, x0_k, fy_k, fx_k, h, w, c)
    if cp != c:
        fval = jnp.pad(fval, ((0, 0), (0, 0), (0, cp - c)))

    qs = _query_subblock(t, 512)

    # tile-chunked execution: windows are (wh*ww)/(th*tw) x bigger than the
    # queries they serve (32x at the default spec) — materializing all of
    # them at once OOMs HBM at 864^2. Gather + kernel run per chunk of
    # tiles under lax.map, bounding the window transient to ~0.5 GB.
    tc_budget = max(256, (512 * 1024 * 1024) // (wh * ns * xqc * x.dtype.itemsize))
    tcn = min(bnt, tc_budget)
    nchunks = -(-bnt // tcn)
    padt = nchunks * tcn - bnt

    def padded_t(a):
        return jnp.pad(a, ((0, padt),) + ((0, 0),) * (a.ndim - 1)).reshape(
            nchunks, tcn, *a.shape[1:]
        )

    kern = functools.partial(_warp_kernel, spec=spec, c=cp, qs=qs)

    def run_chunk(args):
        yl_c, fy_c, xl_c, fx_c, fpos_c, fval_c, rows_c = args
        win_c = jnp.take(table_flat, rows_c.reshape(-1), axis=0).reshape(
            tcn, wh, ns * xqc
        )
        return pl.pallas_call(
            kern,
            grid=(tcn,),
            in_specs=[
                pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kf, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kf, cp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, wh, ns * xqc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, cp, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((tcn, cp, t), x.dtype),
            interpret=interpret,
        )(yl_c, fy_c, xl_c, fx_c, fpos_c, fval_c, win_c)

    chunk_args = (
        padded_t(p["yl"].reshape(bnt, 1, t)),
        padded_t(p["fyt"].reshape(bnt, 1, t).astype(jnp.float32)),
        padded_t(p["xl"].reshape(bnt, 1, t)),
        padded_t(p["fxt"].reshape(bnt, 1, t).astype(jnp.float32)),
        padded_t(fpos),
        padded_t(fval.astype(jnp.float32)),
        padded_t(rows_g),
    )
    if nchunks == 1:
        out = run_chunk(jax.tree.map(lambda a: a[0], chunk_args))
    else:
        out = jax.lax.map(run_chunk, chunk_args).reshape(
            nchunks * tcn, cp, t
        )[:bnt]

    # bounded exact recompute of over-budget tiles
    counts = p["counts"].reshape(bnt)
    nt_bad = min(max(spec.nt_bad, bnt // 24), bnt)
    bad_c, bad_i = jax.lax.top_k(counts, nt_bad)
    img_rows_b = (bad_i // nt * (h * w))[:, None]
    y0_b = jnp.take(p["y0t"].reshape(bnt, t), bad_i, axis=0)
    x0_b = jnp.take(p["x0t"].reshape(bnt, t), bad_i, axis=0)
    fy_b = jnp.take(p["fyt"].reshape(bnt, t), bad_i, axis=0)
    fx_b = jnp.take(p["fxt"].reshape(bnt, t), bad_i, axis=0)
    vals_b = _exact_taps(x_flat, img_rows_b, y0_b, x0_b, fy_b, fx_b, h, w, c)
    if cp != c:
        vals_b = jnp.pad(vals_b, ((0, 0), (0, 0), (0, cp - c)))
    vals_b = jnp.swapaxes(vals_b, 1, 2).astype(x.dtype)  # (nt_bad, Cp, T)
    keep = (bad_c > kf)[:, None, None]
    merged = jnp.where(keep, vals_b, jnp.take(out, bad_i, axis=0))
    out = out.at[bad_i].set(merged)

    out = out.reshape(b, nh, nw, cp, th, tw).transpose(0, 1, 4, 2, 5, 3)
    windowed = out.reshape(b, nh * th, nw * tw, cp)[:, :hq, :wq, :c]

    n_over = jnp.sum(counts > kf)

    def lean_fallback(_):
        # recompute over all queries, chunked, from the untiled fields
        g = flow.reshape(b, hq * wq, 2).astype(jnp.float32)
        ix = (g[..., 0] + 1) * w / 2 - 0.5
        iy = (g[..., 1] + 1) * h / 2 - 0.5
        x0f, y0f = jnp.floor(ix), jnp.floor(iy)
        fx, fy = ix - x0f, iy - y0f
        y0 = y0f.astype(jnp.int32)
        x0 = x0f.astype(jnp.int32)
        n = hq * wq
        nch = max(1, n // 65536)
        csz = -(-n // nch)
        pad = nch * csz - n
        img_off = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None]

        def padded(a):
            return jnp.pad(a, ((0, 0), (0, pad))).reshape(b, nch, csz)

        def chunk(args):
            y0c, x0c, fyc, fxc, off = args
            return _exact_taps(x_flat, off, y0c, x0c, fyc, fxc, h, w, c)

        outf = jax.lax.map(
            chunk,
            (
                padded(y0).transpose(1, 0, 2),
                padded(x0).transpose(1, 0, 2),
                padded(fy).transpose(1, 0, 2),
                padded(fx).transpose(1, 0, 2),
                jnp.broadcast_to(img_off[None], (nch, b, 1)),
            ),
        )
        outf = outf.transpose(1, 0, 2, 3).reshape(b, nch * csz, c)[:, :n]
        return outf.reshape(b, hq, wq, c).astype(x.dtype)

    return jax.lax.cond(
        n_over <= nt_bad, lambda _: windowed, lean_fallback, operand=None
    )


# ---------------------------------------------------------------------------
# Windowed local correlation (fine decoder scales)
# ---------------------------------------------------------------------------
#
# The (2r+1)^2-tap local correlation (reference
# romatch/utils/local_correlation.py:39-74, the fused-local-corr CUDA
# extension's semantics) at the fine scales is gather-bound in the XLA
# formulation (ops/local_corr.py patch method: n * P^2 * C gathered bytes;
# measured 446 ms/batch across s8-up/s4-up/s4-coarse). Windowed
# reformulation: a 16x16 query tile's integer tap patches all live in one
# 48x48 feature window, so
#
#   dpatch[q, u, v] = f0[q] . f1[y0_q+u-r, x0_q+v-r]
#                   = D[yl_q+u-r, xl_q+v-r, q],
#   D = W_flat @ f0_tile^T    (one MXU matmul per tile x channel-chunk)
#
# and the per-query patch extraction is a factored one-hot masking over the
# tile corrvol D (VPU, P*wh*ww + P^2*wh ops per query-block) — HBM sees
# each window once per channel-chunk and never materializes D. The 4-corner
# bilinear combine stays in XLA (identical to local_corr._combine_corners).


@dataclass(frozen=True)
class CorrSpec:
    th: int = 16
    tw: int = 16
    wh: int = 48
    xq: int = 8
    ns: int = 6
    pm: int = 16
    kf: int = 16        # per-tile fixup slots (exact XLA patches)
    nt_bad: int = 48    # min over-budget tiles recomputed exactly (scales
                        # with tile count at call time: max(nt_bad, bnt/24))
    cc: int = 128       # channel chunk floor (auto-raised to fill VMEM)
    scale_wh: bool = True  # grow windows to 64 rows at >=200^2 maps

    @property
    def t(self) -> int:
        return self.th * self.tw

    @property
    def ww(self) -> int:
        return self.ns * self.xq


def _corr_kernel(
    oy_s, jx_s, img_s,
    yl_ref, xl_ref, fpos_ref, fdp_ref, f0_ref,
    tab_ref,
    o_ref,
    *scratch,
    spec: CorrSpec, radius: int, cc: int,
):
    # scratch = (win, sems) single-chunk / (win, dacc, sems) multi-chunk;
    # with one chunk the tile corrvol lives only in registers — no dacc
    # VMEM round-trips, and the MXU dot gets the full K = C depth.
    if len(scratch) == 3:
        win, dacc, sems = scratch
    else:
        (win, sems), dacc = scratch, None
    i = pl.program_id(0)
    ci = pl.program_id(1)
    nc = pl.num_programs(1)
    wh, xq, ns, t, kf = spec.wh, spec.xq, spec.ns, spec.t, spec.kf
    ww = spec.ww
    p = 2 * radius + 2
    pp = p * p
    f32 = jnp.float32

    step = i * nc + ci
    slot = jax.lax.rem(step, 2)

    # table is (nc, B, Hp, NJ, XQ, cc): every sliced dim is LEADING — the
    # last two dims (xq, cc) are copied whole. Mosaic tiles HBM memrefs on
    # their trailing two dims, so DMA slices there are illegal/padded.
    def start(ti, cj, sl):
        pltpu.make_async_copy(
            tab_ref.at[
                cj, img_s[ti], pl.ds(oy_s[ti], wh), pl.ds(jx_s[ti], ns)
            ],
            win.at[sl],
            sems.at[sl],
        ).start()

    @pl.when(step == 0)
    def _():
        start(i, ci, slot)

    @pl.when(step + 1 < pl.num_programs(0) * nc)
    def _():
        nxt_wrap = ci + 1 == nc
        ni = jnp.where(nxt_wrap, i + 1, i)
        ncj = jnp.where(nxt_wrap, 0, ci + 1)
        start(ni, ncj, 1 - slot)

    pltpu.make_async_copy(
        tab_ref.at[0, 0, pl.ds(0, wh), pl.ds(0, ns)],
        win.at[slot],
        sems.at[slot],
    ).wait()

    f0c = f0_ref[0, 0]  # (cc, T)

    # one big MXU dot per (tile, chunk): (wh*ww, cc) @ (cc, T) — the whole
    # window flattens by a leading-dims merge (minor dim cc unchanged)
    wflat = win[slot].reshape(wh * ww, cc)
    d_new = jax.lax.dot_general(
        wflat, f0c, (((1,), (0,)), ((), ())), preferred_element_type=f32
    ).reshape(wh, ww, t)
    if dacc is not None:
        dacc[...] = jnp.where(ci == 0, d_new, dacc[...] + d_new)

    @pl.when(ci == nc - 1)
    def _():
        yl = yl_ref[0]   # (1, T)
        xl = xl_ref[0]
        ok = (
            (yl >= radius) & (yl <= wh - 2 - radius)
            & (xl >= radius) & (xl <= ww - 2 - radius)
        )
        fpos = fpos_ref[0]  # (KF, 1)
        qi = jax.lax.broadcasted_iota(jnp.int32, (kf, t), 1)
        onehot = (qi == fpos).astype(f32)
        fix = jax.lax.dot_general(
            fdp_ref[0], onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (PP, T)

        xi = jax.lax.broadcasted_iota(jnp.int32, (ww, t), 0)
        yi = jax.lax.broadcasted_iota(jnp.int32, (wh, t), 0)
        # factored extraction, one pass over dacc: per window row y, the
        # x-selections XS_v (p of them), scattered into the p row-offsets u
        # that could have produced them — dacc is read once, not p times
        mxs = [(xi == xl + (v - radius)).astype(f32) for v in range(p)]
        mys = [(yi == yl + (u - radius)).astype(f32) for u in range(p)]
        d_all = d_new if dacc is None else dacc[...]  # (wh, ww, T)
        xs = [
            jnp.sum(d_all * mxv[None, :, :], axis=1) for mxv in mxs
        ]  # p x (wh, T)
        rows = []
        for u in range(p):
            for v in range(p):
                rows.append(jnp.sum(xs[v] * mys[u], axis=0, keepdims=True))
        dp = jnp.concatenate(rows, axis=0)  # (PP, T), row u*P+v
        out = jnp.where(ok, dp, 0.0) + fix
        o_ref[0] = out.astype(o_ref.dtype)


def _exact_dpatch(f1_flat, img_rows, y0, x0, f0vec, radius, h, w, c):
    """Masked corner-dot patches for arbitrary query sets.

    y0/x0 (...,) integer tap bases (original coords), f0vec (..., C) already
    scaled by 1/sqrt(C). Returns (..., P, P) f32, matching the kernel's
    dpatch semantics (out-of-image taps contribute 0).
    """
    p = 2 * radius + 2
    u = jnp.arange(p, dtype=jnp.int32) - radius
    yy = y0[..., None, None] + u[:, None]
    xx = x0[..., None, None] + u[None, :]
    valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
    rows = (
        img_rows[..., None, None]
        + jnp.clip(yy, 0, h - 1) * w
        + jnp.clip(xx, 0, w - 1)
    )
    vals = jnp.take(f1_flat, rows.reshape(-1), axis=0).reshape(rows.shape + (c,))
    dp = jnp.einsum(
        "...uvc,...c->...uv",
        vals.astype(jnp.float32),
        f0vec.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return dp * valid.astype(jnp.float32)


def _tile_vector_fields(a, hq, wq, th, tw):
    """(B, Hq, Wq, C) -> (B*nt, T, C) tile-major (edge-padded)."""
    b, _, _, c = a.shape
    ph, pw = (-hq) % th, (-wq) % tw
    if ph or pw:
        a = jnp.pad(a, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    nh, nw = a.shape[1] // th, a.shape[2] // tw
    a = a.reshape(b, nh, th, nw, tw, c).transpose(0, 1, 3, 2, 4, 5)
    return a.reshape(b * nh * nw, th * tw, c)


@functools.partial(
    jax.jit, static_argnames=("radius", "spec", "interpret")
)
def windowed_local_corr(
    f0: jnp.ndarray,
    f1: jnp.ndarray,
    radius: int,
    flow: jnp.ndarray,
    spec: CorrSpec = CorrSpec(),
    interpret: bool = False,
) -> jnp.ndarray:
    """Windowed-tile local correlation: exact replacement for
    ``local_correlation(f0, f1, radius, flow)`` (ops/local_corr.py) at the
    fine scales. f0, f1 (B, H, W, C); flow (B, H, W, 2); returns
    (B, H, W, (2r+1)^2) in f0.dtype.
    """
    b, h, w, c = f0.shape
    if spec.scale_wh and h >= 120 and spec.wh < 64:
        # window spread grows with resolution (same normalized warp, more
        # pixels): 48^2 windows overflow the miss budgets at >=140^2 maps
        # (measured: 140^2 wh48 trips the whole-batch fallback, wh64 never)
        spec = CorrSpec(**{**spec.__dict__, "wh": 64, "ns": 8})
    wh, xq, pm, kf = spec.wh, spec.xq, spec.pm, spec.kf
    ww = spec.ww

    from .local_corr import _local_corr_patch_single

    if (
        h + 2 * pm < wh
        or -(-(w + 2 * pm) // xq) * xq < ww + xq
        or pm < radius + 1
    ):
        out = jax.lax.map(
            lambda args: _local_corr_patch_single(*args, radius), (f0, f1, flow)
        )
        return out.astype(f0.dtype)

    plan = _plan(flow, h, w, spec, radius=radius)
    bnt = b * plan["nt"]

    counts = plan["counts"].reshape(bnt)
    nt_bad = min(max(spec.nt_bad, bnt // 24), bnt)
    n_over = jnp.sum(counts > kf)

    # The whole windowed computation (table build, fixup gathers, Pallas
    # kernel, bad-tile recompute) lives INSIDE the cond's true branch:
    # when the flow is too wild for the budgets (e.g. random-weight
    # benchmark warps, pure-noise coarse matches) the false branch runs
    # the plain patch path WITHOUT paying for the windowed work first.
    # Only the true branch contains pallas calls (a cond with pallas in
    # BOTH branches compiles pathologically — measured round 2).
    def windowed_branch(_):
        return _windowed_corr_compute(
            f0, f1, radius, flow, spec, plan, counts, nt_bad, interpret
        )

    def patch_branch(_):
        out = jax.lax.map(
            lambda args: _local_corr_patch_single(*args, radius), (f0, f1, flow)
        )
        return out.astype(f0.dtype)

    return jax.lax.cond(n_over <= nt_bad, windowed_branch, patch_branch, None)


def _windowed_corr_compute(
    f0, f1, radius, flow, spec, plan, counts, nt_bad, interpret
):
    b, h, w, c = f0.shape
    th, tw, wh, xq, ns, pm, kf, cc = (
        spec.th, spec.tw, spec.wh, spec.xq, spec.ns, spec.pm, spec.kf, spec.cc
    )
    ww, t = spec.ww, spec.t
    p_ = 2 * radius + 2
    pp = p_ * p_
    nt, nh, nw, hp, wpx, njq = (
        plan["nt"], plan["nh"], plan["nw"], plan["hp"], plan["wpx"], plan["njq"]
    )
    bnt = b * nt

    # adaptive channel chunk (see windowed_local_corr notes)
    if cc == CorrSpec.cc:
        cmax = max(128, -(-c // 128) * 128)
        for cand in (512, 256, 128):
            if cand > cmax:
                continue
            win_b = 2 * wh * ww * cand * f1.dtype.itemsize
            ncand = -(-c // cand)
            dacc_b = 0 if ncand == 1 else wh * ww * t * 4
            # extraction temporaries (p x XS + masks) ride on top of the
            # window + corrvol; leave ~6 MB of the 16 MB scope for them
            if win_b + dacc_b + wh * ww * t * 4 <= 10 * 1024 * 1024:
                cc = cand
                break

    # channel pad to a cc multiple (zero channels contribute 0 to the dots)
    cpad = -(-c // cc) * cc
    nc = cpad // cc
    scale = 1.0 / jnp.sqrt(jnp.float32(c))
    if cpad != c:
        f1p = jnp.pad(f1, ((0, 0), (0, 0), (0, 0), (0, cpad - c)))
        f0p = jnp.pad(f0, ((0, 0), (0, 0), (0, 0), (0, cpad - c)))
    else:
        f1p, f0p = f1, f0

    xp = jnp.pad(f1p, ((0, 0), (pm, pm), (pm, wpx - w - pm), (0, 0)))
    # (nc, B, Hp, NJ, XQ, cc): channel-chunk major so in-kernel DMA slices
    # only leading dims (see _corr_kernel notes)
    table = xp.reshape(b, hp, njq, xq, nc, cc).transpose(4, 0, 1, 2, 3, 5)

    f0t = _tile_vector_fields(
        (f0p.astype(jnp.float32) * scale).astype(f1.dtype), h, w, th, tw
    )  # (bnt, T, Cp)
    f0r = jnp.swapaxes(f0t, 1, 2).reshape(bnt, nc, cc, t)

    # fixup slots: exact dpatches for compacted needs-fix queries
    fpos = _compact_miss(
        plan["needfix"].reshape(bnt, 1, t), t, kf, interpret=interpret
    )
    sel = jnp.minimum(fpos[:, :, 0], t - 1)
    y0_k = jnp.take_along_axis(plan["y0t"].reshape(bnt, t), sel, axis=1)
    x0_k = jnp.take_along_axis(plan["x0t"].reshape(bnt, t), sel, axis=1)
    f0_k = jnp.take_along_axis(f0t, sel[..., None], axis=1).astype(jnp.float32)
    f1_flat = f1p.reshape(b * h * w, cpad)
    img_rows = (jnp.arange(bnt, dtype=jnp.int32) // nt * (h * w))[:, None]

    tile_chunk = max(1, min(bnt, (64 * 1024 * 1024) // (kf * pp * cpad * 4)))
    nch = -(-bnt // tile_chunk)
    padn = nch * tile_chunk - bnt

    def padded(a):
        return jnp.pad(
            a, ((0, padn),) + ((0, 0),) * (a.ndim - 1)
        ).reshape(nch, tile_chunk, *a.shape[1:])

    fdp = jax.lax.map(
        lambda args: _exact_dpatch(f1_flat, *args, radius, h, w, cpad),
        (padded(img_rows), padded(y0_k), padded(x0_k), padded(f0_k)),
    ).reshape(nch * tile_chunk, kf, pp)[:bnt]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bnt, nc),
        in_specs=[
            pl.BlockSpec((1, 1, t), lambda i, ci, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i, ci, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kf, 1), lambda i, ci, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kf, pp), lambda i, ci, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cc, t), lambda i, ci, *_: (i, ci, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, pp, t), lambda i, ci, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((2, wh, ns, xq, cc), f1.dtype)]
        + ([pltpu.VMEM((wh, ww, t), jnp.float32)] if nc > 1 else [])
        + [pltpu.SemaphoreType.DMA((2,))],
    )
    out = pl.pallas_call(
        functools.partial(_corr_kernel, spec=spec, radius=radius, cc=cc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bnt, pp, t), jnp.float32),
        interpret=interpret,
    )(
        plan["oy"].reshape(bnt).astype(jnp.int32),
        plan["jx"].reshape(bnt).astype(jnp.int32),
        (jnp.arange(bnt, dtype=jnp.int32) // nt),
        plan["yl"].reshape(bnt, 1, t),
        plan["xl"].reshape(bnt, 1, t),
        fpos,
        fdp.astype(jnp.float32),
        f0r,
        table,
    )

    # bounded exact recompute of over-budget tiles
    bad_c, bad_i = jax.lax.top_k(counts, nt_bad)
    y0_b = jnp.take(plan["y0t"].reshape(bnt, t), bad_i, axis=0)
    x0_b = jnp.take(plan["x0t"].reshape(bnt, t), bad_i, axis=0)
    f0_b = jnp.take(f0t, bad_i, axis=0).astype(jnp.float32)
    img_b = (bad_i // nt * (h * w))[:, None]
    bchunk = max(1, min(nt_bad, (64 * 1024 * 1024) // (t * pp * cpad * 4)))
    nbc = -(-nt_bad // bchunk)
    padb = nbc * bchunk - nt_bad

    def paddedb(a):
        return jnp.pad(
            a, ((0, padb),) + ((0, 0),) * (a.ndim - 1)
        ).reshape(nbc, bchunk, *a.shape[1:])

    vals_b = jax.lax.map(
        lambda args: _exact_dpatch(f1_flat, *args, radius, h, w, cpad),
        (paddedb(img_b), paddedb(y0_b), paddedb(x0_b), paddedb(f0_b)),
    ).reshape(nbc * bchunk, t, pp)[:nt_bad]
    vals_b = jnp.swapaxes(vals_b, 1, 2)  # (nt_bad, PP, T)
    keep = (bad_c > kf)[:, None, None]
    merged = jnp.where(keep, vals_b, jnp.take(out, bad_i, axis=0))
    out = out.at[bad_i].set(merged)

    # untile -> (B, H, W, P, P) -> corner combine -> (B, H, W, K)
    out = out.reshape(b, nh, nw, pp, th, tw).transpose(0, 1, 4, 2, 5, 3)
    dp = out.reshape(b, nh * th, nw * tw, pp)[:, :h, :w].reshape(
        b, h, w, p_, p_
    )
    g = flow.astype(jnp.float32)
    ix = (g[..., 0] + 1) * w / 2 - 0.5
    iy = (g[..., 1] + 1) * h / 2 - 0.5
    fx = (ix - jnp.floor(ix))[..., None, None]
    fy = (iy - jnp.floor(iy))[..., None, None]
    return _combine_corners(dp, fy, fx).astype(f0.dtype)
