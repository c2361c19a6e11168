"""Windowed tile sampler v2 — production path for the matcher's scale-1
warp lookups (and the shared planning layer for windowed kernels).

Replaces the staging design in ``ops/window_warp.py`` (kept as the
documented v1 experiment). Same idea — a 64x64 query tile's bilinear
targets cluster in a small window, so the scattered gather becomes dense
MXU/VPU work on a VMEM-resident window — but four structural changes,
each driven by round-2/3 measurements (tools/profile_window.py):

  1. **No unfold, no XLA window gather.** The feature map is zero-padded
     and reshaped (pure reshape) into an x-segment table
     ``(B, Hp, NJ, XQ*C)``; each grid step DMAs its tile's ``ns`` window
     segments HBM->VMEM directly (double-buffered across tiles, dynamic
     offsets from scalar-prefetched per-tile origins). v1 materialized a
     3x-duplicated unfolded copy plus a gathered window tensor (~35 ms at
     864^2 C=9); here windows only ever exist in VMEM.
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
from .window_warp import _compact_miss


@dataclass(frozen=True)
class WarpSpec:
    th: int = 64        # query tile height
    tw: int = 64        # query tile width
    wh: int = 128       # window rows
    xq: int = 64        # x segment quantum (window origin granularity)
    ns: int = 3         # segments per window; window cols ww = ns*xq
    pm: int = 32        # zero-pad margin around the image
    kf: int = 128       # per-tile in-kernel fixup slots
    nt_bad: int = 64    # over-budget tiles recomputed exactly per batch
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
    oy_s, jx_s, img_s,          # scalar-prefetch (bnt,) int32
    yl_ref, fy_ref, xl_ref, fx_ref, fpos_ref, fval_ref,  # VMEM per-tile
    tab_ref,                     # ANY (B, Hp, NJ, XQ*C)
    o_ref,                       # VMEM (1, C, T)
    win, sems,                   # scratch: (2, ns, wh, xqc), DMA sems (2, ns)
    *, spec: WarpSpec, c: int, qs: int, nt: int,
):
    i = pl.program_id(0)
    wh, xq, ns, t, kf = spec.wh, spec.xq, spec.ns, spec.t, spec.kf
    xqc = xq * c
    nq = t // qs

    def start_tile(ti, buf):
        for s in range(ns):
            pltpu.make_async_copy(
                tab_ref.at[img_s[ti], pl.ds(oy_s[ti], wh), jx_s[ti] + s, :],
                win.at[buf, s],
                sems.at[buf, s],
            ).start()

    def wait_tile(buf):
        for s in range(ns):
            pltpu.make_async_copy(
                tab_ref.at[0, pl.ds(0, wh), 0, :], win.at[buf, s], sems.at[buf, s]
            ).wait()

    buf = jax.lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        start_tile(i, buf)

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        start_tile(i + 1, 1 - buf)

    wait_tile(buf)

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
        acc = jnp.zeros((c, qs), f32)
        for s in range(ns):
            w_s = win[buf, s]          # (wh, xqc)
            if spec.dots == "bf16x2":
                my0 = (ri == yl).astype(jnp.bfloat16)
                my1 = (ri == yl + 1).astype(jnp.bfloat16)
                t0 = jax.lax.dot_general(
                    w_s, my0, (((0,), (0,)), ((), ())), preferred_element_type=f32
                )
                t1 = jax.lax.dot_general(
                    w_s, my1, (((0,), (0,)), ((), ())), preferred_element_type=f32
                )
                tm = t0 * (1.0 - fy) + t1 * fy      # (xqc, qs)
            else:
                my = jnp.where(ri == yl, 1.0 - fy, 0.0) + jnp.where(
                    ri == yl + 1, fy, 0.0
                )
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

    jax.lax.fori_loop(0, nq, body, 0, unroll=True)


def _plan(flow, h, w, spec: WarpSpec):
    """Shared windowing plan: tile-major index fields, window origins,
    in-window tests and the needs-fix mask (miss AND touches image)."""
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
    oy = jnp.clip(
        jnp.round(jnp.mean(ypc, axis=-1) - wh / 2).astype(jnp.int32), 0, hp - wh
    )
    jx = jnp.clip(
        jnp.round((jnp.mean(xpc, axis=-1) - ww / 2) / xq).astype(jnp.int32),
        0,
        njq - ns,
    )

    yl = (y0t + pm) - oy[..., None]
    xl = (x0t + pm) - (jx * xq)[..., None]
    inw = (yl >= 0) & (yl <= wh - 2) & (xl >= 0) & (xl <= ww - 2)
    touches = (y0t >= -1) & (y0t <= h - 1) & (x0t >= -1) & (x0t <= w - 1)
    needfix = ~inw & touches
    counts = jnp.sum(needfix, axis=-1)  # (B, nt)

    return dict(
        b=b, hq=hq, wq=wq, nt=nt, nh=nh, nw=nw, hp=hp, wpx=wpx, njq=njq,
        y0t=y0t, x0t=x0t, fyt=fyt, fxt=fxt, yl=yl, xl=xl,
        oy=oy, jx=jx, needfix=needfix, counts=counts,
        ix=ix, iy=iy,
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

    # segment table: pure pad + reshape, no transpose, no duplication
    xp = jnp.pad(x, ((0, 0), (pm, pm), (pm, wpx - w - pm), (0, 0)))
    table = xp.reshape(b, hp, njq, xq * c)

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

    qs = t if t <= 1024 else 1024
    while t % qs:
        qs -= 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bnt,),
        in_specs=[
            pl.BlockSpec((1, 1, t), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kf, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kf, c), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, c, t), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ns, wh, xq * c), x.dtype),
            pltpu.SemaphoreType.DMA((2, ns)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_warp_kernel, spec=spec, c=c, qs=qs, nt=nt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bnt, c, t), x.dtype),
        interpret=interpret,
    )(
        p["oy"].reshape(bnt).astype(jnp.int32),
        p["jx"].reshape(bnt).astype(jnp.int32),
        (jnp.arange(bnt, dtype=jnp.int32) // nt),
        p["yl"].reshape(bnt, 1, t),
        p["fyt"].reshape(bnt, 1, t).astype(jnp.float32),
        p["xl"].reshape(bnt, 1, t),
        p["fxt"].reshape(bnt, 1, t).astype(jnp.float32),
        fpos,
        fval.astype(jnp.float32),
        table,
    )

    # bounded exact recompute of over-budget tiles
    counts = p["counts"].reshape(bnt)
    nt_bad = min(spec.nt_bad, bnt)
    bad_c, bad_i = jax.lax.top_k(counts, nt_bad)
    img_rows_b = (bad_i // nt * (h * w))[:, None]
    y0_b = jnp.take(p["y0t"].reshape(bnt, t), bad_i, axis=0)
    x0_b = jnp.take(p["x0t"].reshape(bnt, t), bad_i, axis=0)
    fy_b = jnp.take(p["fyt"].reshape(bnt, t), bad_i, axis=0)
    fx_b = jnp.take(p["fxt"].reshape(bnt, t), bad_i, axis=0)
    vals_b = _exact_taps(x_flat, img_rows_b, y0_b, x0_b, fy_b, fx_b, h, w, c)
    vals_b = jnp.swapaxes(vals_b, 1, 2).astype(x.dtype)  # (nt_bad, C, T)
    keep = (bad_c > kf)[:, None, None]
    merged = jnp.where(keep, vals_b, jnp.take(out, bad_i, axis=0))
    out = out.at[bad_i].set(merged)

    out = out.reshape(b, nh, nw, c, th, tw).transpose(0, 1, 4, 2, 5, 3)
    windowed = out.reshape(b, nh * th, nw * tw, c)[:, :hq, :wq]

    n_over = jnp.sum(counts > kf)

    def lean_fallback(_):
        y0a = p["y0t"].reshape(bnt, t)
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
