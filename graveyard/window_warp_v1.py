"""Windowed warp sampling v1 — GRAVEYARD (documented negative result).

SUPERSEDED by roma_tpu/ops/lane_warp.py (v3). This v1 kernel and the v2
tile_window.windowed_warp LOST to the plain corner-packed gather because
their window fetch was itself an XLA gather paying 640-1280 B/query of
window-area duplication against the packed gather's ~70 B/query (measured
v5e, 864^2 C=9 bs16: 546-975 ms vs 192 ms). v3 removes the gather from the
window fetch entirely (lane-packed table, per-tile in-kernel DMA). Kept —
outside the installed package — as a working, parity-tested record of the
design space; see graveyard/README.md. The live shared helpers
(_compact_miss, _query_subblock) moved to roma_tpu/ops/window_util.py, and
the warp_sample dispatcher moved to roma_tpu/ops/lane_warp.py.

Original design notes below.
---------------------------------------------------------------------------
Windowed warp sampling — the TPU answer to scattered bilinear lookups.

``grid_sample``-semantics warp lookups (matcher.py x_hat fetch, reference
romatch/models/matcher.py:132) are gather-bound on TPU: XLA's gather engine
sustains only ~30-80 GB/s / ~70-220 M rows/s (measured, v5e), an order of
magnitude under the HBM roofline, and that cost dominates the fine decoder
scales (864^2 lookups were ~350 ms of a 2.5 s two-pass batch).

This module exploits the structure XLA cannot: the warp is *piecewise
smooth*, so the targets of a 64x64 query tile cluster inside a small box.

  1. XLA prep: per query tile, pick a window origin (clamped mean of the
     tile's target corners, x quantized to XQ so windows come from a static
     overlapped-block unfold). Fetch each tile's (WH, WW) feature window
     with ONE wide-row gather per window row — the gather regime that runs
     at ~80 GB/s. Window rows are [c][x]-major so every in-kernel reshape
     splits on leading dims only (Mosaic cannot shape-cast unaligned minor
     dims).
  2. Pallas kernel (one grid step per tile, query sub-blocks via
     fori_loop): build the bilinear one-hot factors My (WH, qs) and
     Mx (WW, qs) from iota compares against the per-query integer offsets,
     contract the window against My on the MXU ((WH, cc*WW)^T @ (WH, qs)
     in channel chunks), weight by Mx and reduce over the window columns.
     The per-pixel "gather" becomes dense MXU/VPU work on VMEM-resident
     data; HBM sees each window once. Out-of-window queries are fixed up
     IN the kernel by a second small MXU one-hot ((KF, C)^T @ (KF, qs))
     over exactly-sampled values prepared in XLA.
  3. Exactness: queries whose target corners fall outside their tile's
     window (warp discontinuities, far out-of-image flows) are compacted
     per tile by a Pallas triangular-matmul cumsum kernel (XLA's sized
     ``nonzero`` costs ~120 ms at these shapes), their true 4-tap bilinear
     values gathered the plain way, and scattered over the kernel output
     by the in-kernel one-hot. If any tile overflows its fixup budget, a
     ``lax.cond`` falls back to a lean chunked gather for the whole batch —
     results are exact for EVERY input, fast for smooth warps.

Zero-padding semantics come for free: windows are cut from a zero-padded
copy of the feature map, so in-window out-of-image taps read zeros, exactly
like ``grid_sample(padding_mode='zeros')`` (torch parity pinned in
tests/test_ops.py).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from roma_tpu.ops.grid_sample import grid_sample
from roma_tpu.ops.window_util import _compact_miss, _query_subblock


@dataclass(frozen=True)
class WindowSpec:
    th: int = 64       # query tile height
    tw: int = 64       # query tile width
    wh: int = 128      # window rows
    ww: int = 192      # window cols (multiple of XQ + tile extent margin)
    xq: int = 64       # window x-origin quantum
    pm: int = 32       # zero-pad margin around the image
    kf: int = 64       # per-tile fixup slots (one-hot scatter width)

    @property
    def t(self) -> int:
        return self.th * self.tw


def _kernel(
    yl_ref, fy_ref, xl_ref, fx_ref, fpos_ref, fval_ref, win_ref, o_ref,
    *, spec, c, qs, cchunk,
):
    """One query tile -> (C, T) output, all layouts Mosaic-native.

    Window rows are [c][x]-major; the y-contraction runs on the MXU as
    (WH, cc*WW)^T @ (WH, qs) whose (cc*WW, qs) result splits on LEADING
    dims only, the x-selection is a middle-axis reduce against Mx (WW, qs),
    and the fixup one-hot scatter is (KF, C)^T @ (KF, qs) — no in-kernel
    transposes or minor-dim shape casts anywhere.
    """
    wh, ww, t, kf = spec.wh, spec.ww, spec.t, spec.kf
    nq = t // qs

    # fori_loop (not an unrolled python loop): Mosaic's scoped-VMEM stack
    # does not reuse buffers across unrolled iterations, so unrolling nq
    # sub-blocks multiplies the working set past the 16 MB scope.
    def body(qb, _):
        sl = pl.ds(qb * qs, qs)
        yl = yl_ref[0, :, sl]  # (1, qs) int32
        fy = fy_ref[0, :, sl]  # (1, qs) f32
        xl = xl_ref[0, :, sl]
        fx = fx_ref[0, :, sl]

        ri = jax.lax.broadcasted_iota(jnp.int32, (wh, qs), 0)
        my = jnp.where(ri == yl, 1.0 - fy, 0.0) + jnp.where(ri == yl + 1, fy, 0.0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (ww, qs), 0)
        mx = jnp.where(ci == xl, 1.0 - fx, 0.0) + jnp.where(ci == xl + 1, fx, 0.0)

        # in-kernel exact fixup: (C, qs) = fval^T @ onehot; padded slots
        # carry pos = T and never match
        fpos = fpos_ref[0]        # (KF, 1) int32, tile-local query index
        fval = fval_ref[0]        # (KF, C) f32
        qi = jax.lax.broadcasted_iota(jnp.int32, (kf, qs), 1) + qb * qs
        onehot = (qi == fpos).astype(jnp.float32)
        fix = jax.lax.dot_general(
            fval, onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (C, qs)

        ok = (yl >= 0) & (yl <= wh - 2) & (xl >= 0) & (xl <= ww - 2)  # (1, qs)

        for c0 in range(0, c, cchunk):
            cc = min(cchunk, c - c0)
            wchunk = win_ref[0, :, c0 * ww : (c0 + cc) * ww].astype(jnp.float32)
            t1 = jax.lax.dot_general(
                wchunk, my, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(cc, ww, qs)
            red = jnp.sum(t1 * mx[None, :, :], axis=1)  # (cc, qs)
            out = jnp.where(ok, red, 0.0) + fix[c0 : c0 + cc]
            o_ref[0, c0 : c0 + cc, sl] = out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nq, body, 0)


def _pick_origin(vals, lo_len, win_len, quantum=1):
    """Clamped, quantized window origin centered on the mean target."""
    m = jnp.mean(vals, axis=-1)
    o = jnp.round(m - win_len / 2).astype(jnp.int32)
    hi = lo_len - win_len
    if quantum > 1:
        o = jnp.round(o.astype(jnp.float32) / quantum).astype(jnp.int32) * quantum
    return jnp.clip(o, 0, hi)


def _tile_fields(a, hq, wq, th, tw):
    """(B, Hq*Wq) -> (B, nt, T) in tile-major order (edge-padded)."""
    b = a.shape[0]
    a = a.reshape(b, hq, wq)
    ph, pw = (-hq) % th, (-wq) % tw
    if ph or pw:
        a = jnp.pad(a, ((0, 0), (0, ph), (0, pw)), mode="edge")
    nh, nw = a.shape[1] // th, a.shape[2] // tw
    a = a.reshape(b, nh, th, nw, tw).transpose(0, 1, 3, 2, 4)
    return a.reshape(b, nh * nw, th * tw), (nh, nw, ph, pw)


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def windowed_grid_sample(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    spec: WindowSpec = WindowSpec(),
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact ``grid_sample(mode='bilinear', padding_mode='zeros',
    align_corners=False)`` for (B, Hq, Wq, 2) grids, windowed-kernel fast
    path. See module docstring; falls back to the plain gather path inside
    ``lax.cond`` when any tile has more than ``spec.kf`` out-of-window
    queries.
    """
    b, h, w, c = x.shape
    hq, wq = grid.shape[1], grid.shape[2]
    n = hq * wq
    th, tw, wh, ww, xq, pm = spec.th, spec.tw, spec.wh, spec.ww, spec.xq, spec.pm
    t, kf = spec.t, spec.kf

    hp = h + 2 * pm
    wp = w + 2 * pm
    if hp < wh or wp < ww:
        # image smaller than the window: nothing to win, use the plain path
        return grid_sample(x, grid)

    g = grid.reshape(b, n, 2).astype(jnp.float32)
    ix = (g[..., 0] + 1) * w / 2 - 0.5
    iy = (g[..., 1] + 1) * h / 2 - 0.5
    x0f, y0f = jnp.floor(ix), jnp.floor(iy)
    fx, fy = ix - x0f, iy - y0f
    # padded-image coords
    y0 = y0f.astype(jnp.int32) + pm
    x0 = x0f.astype(jnp.int32) + pm

    y0t, geom = _tile_fields(y0, hq, wq, th, tw)
    x0t, _ = _tile_fields(x0, hq, wq, th, tw)
    fyt, _ = _tile_fields(fy, hq, wq, th, tw)
    fxt, _ = _tile_fields(fx, hq, wq, th, tw)
    nh, nw, _, _ = geom
    nt = y0t.shape[1]

    # make (Wp' - WW) a non-negative multiple of XQ
    wpx = ww + max(0, -(-(wp - ww) // xq)) * xq
    nj = (wpx - ww) // xq + 1

    oy = _pick_origin(y0t.astype(jnp.float32), hp, wh)          # (B, nt)
    jx = _pick_origin(x0t.astype(jnp.float32), wpx, ww, xq) // xq

    yl = y0t - oy[..., None]
    xl = x0t - (jx * xq)[..., None]
    miss = ~((yl >= 0) & (yl <= wh - 2) & (xl >= 0) & (xl <= ww - 2))

    # window table: padded image, channel-major, x-unfolded into nj
    # overlapping blocks; rows arrive in the kernel as (WH, C*WW)
    xp = jnp.pad(x, ((0, 0), (pm, pm), (pm, wpx - w - pm), (0, 0)))
    xt_ = jnp.transpose(xp, (0, 1, 3, 2))  # (B, Hp, C, Wp')
    u = jnp.stack(
        [jax.lax.slice_in_dim(xt_, j * xq, j * xq + ww, axis=3) for j in range(nj)],
        axis=1,
    )  # (B, nj, Hp, C, WW)
    u = u.transpose(0, 2, 1, 3, 4).reshape(b, hp * nj, c * ww)

    rows = (oy[..., None] + jnp.arange(wh)[None, None, :]) * nj + jx[..., None]
    win = jnp.take_along_axis(
        u, rows.reshape(b, nt * wh, 1), axis=1
    ).reshape(b * nt, wh, ww * c)

    iyt, _ = _tile_fields(iy, hq, wq, th, tw)
    ixt, _ = _tile_fields(ix, hq, wq, th, tw)

    def run_kernel(_):
        # per-tile miss compaction on the MXU (see _compact_kernel), then
        # exact 4-tap values for the compacted queries from the flat table
        fpos = _compact_miss(
            miss.reshape(b * nt, 1, t), t, kf, interpret=interpret
        )  # (bnt, KF, 1)
        sel = jnp.minimum(fpos[:, :, 0], t - 1)
        sy = jnp.take_along_axis(iyt.reshape(b * nt, t), sel, axis=1)
        sx = jnp.take_along_axis(ixt.reshape(b * nt, t), sel, axis=1)
        x0s, y0s = jnp.floor(sx), jnp.floor(sy)
        fxk, fyk = (sx - x0s)[..., None], (sy - y0s)[..., None]
        x0i, y0i = x0s.astype(jnp.int32), y0s.astype(jnp.int32)
        img_off = (jnp.arange(b * nt, dtype=jnp.int32) // nt * (h * w))[:, None]
        xg = x.reshape(b * h * w, c)
        fval = jnp.zeros((b * nt, kf, c), jnp.float32)
        for dy, dx, wgt in (
            (0, 0, (1 - fyk) * (1 - fxk)),
            (0, 1, (1 - fyk) * fxk),
            (1, 0, fyk * (1 - fxk)),
            (1, 1, fyk * fxk),
        ):
            yy, xx = y0i + dy, x0i + dx
            v = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            rows = img_off + jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
            rws = jnp.take(xg, rows.reshape(-1), axis=0).reshape(b * nt, kf, c)
            fval = fval + rws.astype(jnp.float32) * (wgt * v[..., None])
        # t1 is (cchunk*WW, qs) f32 in VMEM: bound it to ~4 MB per chunk,
        # and shrink the query sub-block for wide channels so the whole
        # working set (double-buffered window + t1 + My/Mx) stays under
        # the 16 MB VMEM scope
        qs = _query_subblock(t, 1024 if c <= 16 else 512)
        cchunk = min(c, max(1, 2_000_000 // (ww * qs * 4)))
        out = pl.pallas_call(
            functools.partial(_kernel, spec=spec, c=c, qs=qs, cchunk=cchunk),
            grid=(b * nt,),
            in_specs=[
                pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kf, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kf, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, spec.wh, c * ww), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, c, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((b * nt, c, t), x.dtype),
            interpret=interpret,
        )(
            yl.reshape(b * nt, 1, t),
            fyt.reshape(b * nt, 1, t).astype(jnp.float32),
            xl.reshape(b * nt, 1, t),
            fxt.reshape(b * nt, 1, t).astype(jnp.float32),
            fpos.reshape(b * nt, kf, 1),
            fval.reshape(b * nt, kf, c).astype(jnp.float32),
            win,
        )
        # (b*nt, C, T) -> NHWC (XLA picks intermediate layouts)
        out = out.reshape(b, nh, nw, c, th, tw).transpose(0, 1, 4, 2, 5, 3)
        out = out.reshape(b, nh * th, nw * tw, c)
        return out[:, :hq, :wq]

    def lean_fallback(_):
        # chunked 4-tap gather: the packed-table grid_sample compiles with
        # pathologically padded temps inside a cond branch, so the overflow
        # path uses plain masked corner gathers with bounded transients
        xg = x.reshape(b * h * w, c)
        img_off = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None]
        x0a = x0 - pm
        y0a = y0 - pm

        def chunk(args):
            y0c, x0c, fyc, fxc, off = args
            acc = jnp.zeros(y0c.shape + (c,), jnp.float32)
            fyc = fyc[..., None]
            fxc = fxc[..., None]
            for dy, dx, wgt in (
                (0, 0, (1 - fyc) * (1 - fxc)),
                (0, 1, (1 - fyc) * fxc),
                (1, 0, fyc * (1 - fxc)),
                (1, 1, fyc * fxc),
            ):
                yy, xx = y0c + dy, x0c + dx
                v = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
                rows = off + jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
                rws = jnp.take(xg, rows.reshape(-1), axis=0).reshape(rows.shape + (c,))
                acc = acc + rws.astype(jnp.float32) * (wgt * v[..., None])
            return acc

        nch = max(1, n // 65536)
        csz = -(-n // nch)
        pad = nch * csz - n

        def padded(a):
            return jnp.pad(a, ((0, 0), (0, pad))).reshape(b, nch, csz)

        out = jax.lax.map(
            chunk,
            (
                padded(y0a).transpose(1, 0, 2),
                padded(x0a).transpose(1, 0, 2),
                padded(fy).transpose(1, 0, 2),
                padded(fx).transpose(1, 0, 2),
                jnp.broadcast_to(img_off[None], (nch, b, 1)),
            ),
        )  # (nch, B, csz, C)
        out = out.transpose(1, 0, 2, 3).reshape(b, nch * csz, c)[:, :n]
        return out.reshape(b, hq, wq, c).astype(x.dtype)

    # The kernel runs unconditionally; the cond only swaps in the fallback
    # when some tile overflowed its fixup budget (a cond whose branches
    # both contain pallas calls compiles pathologically slowly, so the
    # windowed compute stays outside it).
    windowed = run_kernel(None)
    counts = jnp.sum(miss, axis=-1)  # (B, nt)
    return jax.lax.cond(
        jnp.all(counts <= kf), lambda _: windowed, lean_fallback, operand=None
    )
