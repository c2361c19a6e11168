"""Lane-packed windowed warp sampler (v3) — the fine-scale x_hat lookups.

The plain corner-packed gather (ops/grid_sample.py) is byte-lean (~70
B/query at C=9 bf16) but runs at XLA:TPU's per-row gather ceiling, and
collapses further once the packed table leaves the fast regime: measured
36 ms at 560^2 bs16 but 196 ms at 864^2 and 345 ms at 1344^2 — the
single biggest line in both production configs.  The v1/v2 windowed
samplers lost because their window fetch was itself an XLA gather paying
640-1280 B/query (graveyard/window_warp_v1.py notes).  v3 removes
gathers from the whole path:

  1. **Channels ride the lanes, rows ride the sublanes.**  The feature
     map pads to CP = 128/XQ channels and reshapes — a FREE row-major
     reshape, no transpose — to ``(B, Hp/RB, RB, NJ*128)``: trailing
     dims (RB, 128-multiple) are exactly native tiles.  XQ sets the
     channel budget per spec: the default (xq=8, cp=16) serves the
     scale-1 maps (proj_out = 9); ``_WIDE_C_SPEC`` (xq=2, cp=64)
     serves the scale-2 upsample x_hat (C=64), where the plain gather
     reads 512 B/query and collapses (92 ms at 672^2 bs8 on v5e vs
     52 ms windowed; tools/probe_lane_c64.py).
  2. **Per-tile in-kernel DMA**, double-buffered, origins scalar-
     prefetched.  The y-origin slices a *leading* dim (row-blocks); the
     x-origin slices the *lane* dim at ``jx * 128`` — the multiply
     happens inside the kernel so Mosaic can PROVE 128-divisibility
     (a raw prefetched byte offset fails its divisibility check).
     Each 16x16-query tile fetches its (WH x NS*8px x CP) window as one
     strided sequential copy (~40-80 KB) instead of wh*ns gathered rows.
  3. **Factored bilinear extraction on the MXU.**  One 0/1 one-hot dot
     per x-segment folds BOTH y-corners ((WH, 128)^T @ (WH, 2T)); the
     x-corners are an iota-compare mask + middle-axis reduce.  0/1
     selectors and bf16 texels are exact; all combines run in f32, the
     same arithmetic as the plain gather's 4-corner f32 combine.
  4. **Nothing per-tile outside the kernel.**  Round-4 attribution of
     the first build (560^2 bs16: fixup tap gathers 82 ms, bad-tile
     recompute 18 ms, table transpose 11 ms, per-tile compaction 6 ms —
     vs 17 ms of kernel) moved every fixed cost off the per-tile axis:
     fixup slots exist only for tiles that NEED them (cumsum-compacted
     tile slots; the kernel's fix-map block is indexed by a scalar-
     prefetched slot id, slot 0 = shared zero sentinel), the bad-tile
     budget no longer scales with tile count, and the lane-packed table
     needs no data movement at all beyond the channel pad.

Planning (bounded-influence origins, needs-fix = out-of-window AND
touching the image) is shared with v2 (tile_window._plan).  Exactness:
in-window queries are exact one-hot extractions over the zero-padded
window; out-of-window queries touching the image get exact 4-tap values
via their tile's fix-map slot; fully-out-of-image queries are 0; tiles
with more than ``kf`` fixable misses (up to ``nt_bad`` of them) are
recomputed exactly; beyond that — or when more than ``ntfix`` tiles
need fixing — a ``lax.cond`` routes the WHOLE call to the plain gather,
so results are exact for every input and the Pallas work only runs on
the smooth warps it is built for.

Reference semantics replaced: the scale-1 x_hat warp lookup,
/root/reference/romatch/models/matcher.py:132 (F.grid_sample bilinear,
zeros padding, align_corners=False).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grid_sample import grid_sample
from .tile_window import WarpSpec, _exact_taps, _plan
from .window_util import _compact_miss


@dataclass(frozen=True)
class LaneSpec:
    th: int = 16       # query tile height
    tw: int = 16       # query tile width
    wh: int = 64       # window rows (must be a multiple of the row-block)
    xq: int = 8        # x segment width in px (xq * cp = 128 lanes)
    ns: int = 5        # segments per window; window cols = ns * xq px
    pm: int = 16       # zero-pad margin (>= 1 for the bilinear halo)
    kf: int = 16       # fixup slots per needs-fix tile
    ntfix_div: int = 8  # fixup tile slots = max(64, bnt // ntfix_div)
    nt_bad: int = 64   # over-budget tiles recomputed exactly (fixed)
    nbuf: int = 2      # window DMA pipeline depth (double-buffer default)

    @property
    def t(self) -> int:
        return self.th * self.tw

    @property
    def ww(self) -> int:
        return self.ns * self.xq

    @property
    def cp(self) -> int:
        return 128 // self.xq


def _row_block(dtype) -> int:
    """Native sublane tile: 16 rows bf16, 8 rows f32 — the table's
    trailing dims (RB, lanes) must tile exactly so the DMA's sliced dims
    stay Mosaic-legal."""
    return 16 if dtype == jnp.bfloat16 else 8


def _lane_kernel(
    pk_s,                                # scalar-prefetched per-tile i32:
                                         #   slot<<16 | oyb<<8 | jx
    flds_ref,                            # VMEM (1, 4, T) f32 [yl|fy|xl|fx]
    fix_ref,                             # VMEM (1, CP, T) f32 fix map
    tab_ref,                             # ANY (B, HPB, RB, NJ*128)
    o_ref,                               # VMEM (1, CP, T)
    win, sems,                           # scratch
    *, spec: LaneSpec, rb: int, nt: int,
):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    wh, xq, ns, t, cp = spec.wh, spec.xq, spec.ns, spec.t, spec.cp
    nrb = wh // rb
    nsl = ns * 128
    f32 = jnp.float32
    nbuf = spec.nbuf
    slot = jax.lax.rem(i, nbuf)

    # y slices a leading dim; x slices the lanes at jx*128 — multiplied
    # HERE so Mosaic can prove the 128-divisibility of the lane offset.
    # The origins ride ONE packed i32/tile: four s32[bnt] prefetch arrays
    # overflowed the 1 MB SMEM at 1344^2 (112k tiles = 4 x 444 KB); the
    # image index is i // nt (arithmetic, no array at all) and
    # slot/oyb/jx unpack with shift+mask (masking makes the arithmetic
    # shift sign-safe). Layout slot:16 | oyb:7 | jx:9 — jx needs 9 bits
    # once xq drops to 2 px for the wide-channel specs (672-px maps give
    # njq ~ 352); oyb at 7 bits still covers ~2000-px-tall images at
    # rb=16 (the lane_warp width guards keep both in range).
    def start(ti, sl):
        pk = pk_s[ti]
        pltpu.make_async_copy(
            tab_ref.at[
                ti // nt,
                pl.ds((pk >> 9) & 0x7F, nrb),
                :,
                pl.ds((pk & 0x1FF) * 128, nsl),
            ],
            win.at[sl],
            sems.at[sl],
        ).start()

    # nbuf-deep pipeline: step i waits on its own slot while the next
    # nbuf-1 windows stream (the per-tile wall at 16^2 tiles is DMA
    # latency, not bandwidth or MXU — see tools/probe_lane_c64.py)
    @pl.when(i == 0)
    def _():
        start(0, 0)

    for k in range(1, nbuf - 1):
        @pl.when((i == 0) & (n > k))
        def _(k=k):
            start(k, k)

    @pl.when(i + (nbuf - 1) < n)
    def _():
        start(i + nbuf - 1, jax.lax.rem(i + nbuf - 1, nbuf))

    pltpu.make_async_copy(
        tab_ref.at[0, pl.ds(0, nrb), :, pl.ds(0, nsl)], win.at[slot], sems.at[slot]
    ).wait()

    ff = flds_ref[0]                     # (4, T) f32
    yl = ff[0:1].astype(jnp.int32)       # window-local rows
    fy = ff[1:2]
    xl = ff[2:3].astype(jnp.int32)       # window-local px
    fx = ff[3:4]

    wv = win[slot].reshape(wh, nsl)      # (NRB, RB, NSL): leading merge

    # both y-corner 0/1 selectors in ONE dot over the WHOLE window:
    # (WH, NSL)^T @ (WH, 2T). A per-segment loop did M=128 dots; the
    # fused dot (M = ns*128) is the same FLOPs at real MXU occupancy —
    # it matters for the wide specs (ns 12-24), where the segment loop's
    # tiny dots dominated (v5e sweeps in tools/probe_lane_c64.py).
    ri = jax.lax.broadcasted_iota(jnp.int32, (wh, t), 0)
    myc = jnp.concatenate(
        [(ri == yl).astype(wv.dtype), (ri == yl + 1).astype(wv.dtype)], axis=1
    )
    r = jax.lax.dot_general(
        wv, myc, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )  # (NSL, 2T)
    tm = r[:, :t] * (1.0 - fy) + r[:, t:] * fy      # (NSL, T)
    tm3 = tm.reshape(ns * xq, cp, t)                # leading split only
    ci = jax.lax.broadcasted_iota(jnp.int32, (ns * xq, t), 0)
    sx = jnp.where(ci == xl, 1.0 - fx, 0.0) + jnp.where(
        ci == xl + 1, fx, 0.0
    )
    acc = jnp.sum(tm3 * sx[:, None, :], axis=0)

    ok = (yl >= 0) & (yl <= wh - 2) & (xl >= 0) & (xl <= spec.ww - 2)
    o_ref[0] = (jnp.where(ok, acc, 0.0) + fix_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def lane_warp(
    x: jnp.ndarray,
    flow: jnp.ndarray,
    spec: LaneSpec = LaneSpec(),
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact ``grid_sample(x, flow)`` (bilinear, zeros, align_corners=False)
    via the lane-packed windowed kernel.  x (B, H, W, C<=128/xq); flow
    (B, Hq, Wq, 2) in [-1, 1].  Falls back to the plain gather for small
    images or when the warp overflows the budgets.
    """
    b, h, w, c = x.shape
    th, tw, wh, xq, ns, pm, kf = (
        spec.th, spec.tw, spec.wh, spec.xq, spec.ns, spec.pm, spec.kf
    )
    ww, cp = spec.ww, spec.cp
    rb = _row_block(x.dtype)
    if c > cp or wh % rb:
        return grid_sample(x, flow)

    hp = h + 2 * pm
    wpx = -(-(w + 2 * pm) // xq) * xq
    if hp < wh or wpx < ww + xq:
        return grid_sample(x, flow)   # image smaller than a window
    # packed-scalar width limits (slot:16 | oyb:7 | jx:9 in one i32):
    # row-block origins need <= 7 bits (images up to ~2000 px at rb=16),
    # x segment origins <= 9 bits (~4000 px wide at xq=8, ~1000 at xq=2)
    if (-(-hp // rb)) - wh // rb > 0x7F or wpx // xq - ns > 0x1FF:
        return grid_sample(x, flow)

    # planning shared with the v2 sampler (identical field meanings;
    # y-origins quantized to row-blocks for the tile-aligned DMA)
    pspec = WarpSpec(th=th, tw=tw, wh=wh, xq=xq, ns=ns, pm=pm, kf=kf)
    p = _plan(flow, h, w, pspec, oy_quant=rb)
    bnt = b * p["nt"]

    counts = p["counts"].reshape(bnt)
    ntfix = min(bnt, max(64, bnt // spec.ntfix_div))
    if ntfix > 0xFFFF:
        return grid_sample(x, flow)   # slot id must fit 16 packed bits
    n_miss_tiles = jnp.sum(counts > 0)
    n_over = jnp.sum(counts > kf)

    def windowed_branch(_):
        return _lane_warp_compute(
            x, flow, spec, rb, p, counts, ntfix, interpret
        )

    def plain_branch(_):
        return grid_sample(x, flow)

    return jax.lax.cond(
        (n_over <= spec.nt_bad) & (n_miss_tiles <= ntfix),
        windowed_branch, plain_branch, None,
    )


def _lane_warp_compute(x, flow, spec, rb, p, counts, ntfix, interpret):
    b, h, w, c = x.shape
    th, tw, wh, xq, ns, pm, kf = (
        spec.th, spec.tw, spec.wh, spec.xq, spec.ns, spec.pm, spec.kf
    )
    t, cp = spec.t, spec.cp
    nt, nh, nw, njq = p["nt"], p["nh"], p["nw"], p["njq"]
    bnt = b * nt
    hq, wq = p["hq"], p["wq"]
    f32 = jnp.float32

    hp = h + 2 * pm
    hpb = -(-hp // rb)
    wpx = njq * xq

    # lane-packed table: channel pad + spatial pad + FREE reshape (the
    # trailing (RB, NJ*128) dims are native tiles; no transpose anywhere)
    xc = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - c))) if cp != c else x
    xp = jnp.pad(
        xc, ((0, 0), (pm, hpb * rb - h - pm), (pm, wpx - w - pm), (0, 0))
    )
    table = xp.reshape(b, hpb, rb, njq * 128)

    # ---- fixup slots only for tiles that need them ----------------------
    # slot assignment by cumsum (slot 0 = zero sentinel shared by every
    # clean tile); tiles beyond ntfix fall to the plain branch upstream.
    tilemiss = counts > 0
    order = jnp.cumsum(tilemiss.astype(jnp.int32)) - 1        # (bnt,)
    tile_ids = jnp.arange(bnt, dtype=jnp.int32)
    slotmap = jnp.where(tilemiss & (order < ntfix), order + 1, 0)
    # slot -> tile (out-of-range scatter indices are dropped by XLA)
    starget = jnp.where(tilemiss & (order < ntfix), order, ntfix)
    sel_t = jnp.zeros((ntfix,), jnp.int32).at[starget].set(tile_ids)

    # per-slot query compaction + exact 4-tap values
    nf_s = jnp.take(p["needfix"].reshape(bnt, t), sel_t, axis=0)
    fpos = _compact_miss(
        nf_s.reshape(ntfix, 1, t), t, kf, interpret=interpret
    )  # (ntfix, KF, 1), sentinel t
    sel_q = jnp.minimum(fpos[:, :, 0], t - 1)
    x_flat = x.reshape(b * h * w, c)
    img_rows_s = (sel_t // nt * (h * w))[:, None]

    def tap_at(src_t):
        rows = jnp.take(src_t.reshape(bnt, t), sel_t, axis=0)
        return jnp.take_along_axis(rows, sel_q, axis=1)

    fval = _exact_taps(
        x_flat, img_rows_s, tap_at(p["y0t"]), tap_at(p["x0t"]),
        tap_at(p["fyt"]), tap_at(p["fxt"]), h, w, c,
    )  # (ntfix, KF, C)

    # fix map: the kernel adds fix_ref[slot] — slot 0 is the zero sentinel
    onehot = (
        fpos == jax.lax.broadcasted_iota(jnp.int32, (1, 1, t), 2)
    ).astype(f32)  # (ntfix, KF, T); sentinel t never matches
    fix = jnp.einsum(
        "skc,skt->sct", fval, onehot, preferred_element_type=f32
    )
    if cp != c:
        fix = jnp.pad(fix, ((0, 0), (0, cp - c), (0, 0)))
    fixmap = jnp.concatenate([jnp.zeros((1, cp, t), f32), fix], axis=0)

    # packed per-tile fields: one (4, T) f32 block (yl/xl exact in f32)
    flds = jnp.stack(
        [
            p["yl"].reshape(bnt, t).astype(f32),
            p["fyt"].reshape(bnt, t).astype(f32),
            p["xl"].reshape(bnt, t).astype(f32),
            p["fxt"].reshape(bnt, t).astype(f32),
        ],
        axis=1,
    )

    # one packed i32 per tile (slot:16 | oyb:7 | jx:9) — the width guards
    # are static in lane_warp, so the pack never truncates
    packed = (
        (slotmap.astype(jnp.int32) << 16)
        | ((p["oy"].reshape(bnt) // rb).astype(jnp.int32) << 9)
        | p["jx"].reshape(bnt).astype(jnp.int32)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bnt,),
        in_specs=[
            pl.BlockSpec(
                (1, 4, t), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, cp, t),
                lambda i, pk: ((pk[i] >> 16) & 0xFFFF, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, cp, t), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((spec.nbuf, wh // rb, rb, ns * 128), x.dtype),
            pltpu.SemaphoreType.DMA((spec.nbuf,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_lane_kernel, spec=spec, rb=rb, nt=nt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bnt, cp, t), x.dtype),
        interpret=interpret,
    )(
        packed,
        flds,
        fixmap,
        table,
    )

    # bounded exact recompute of over-budget tiles (fixed budget — over
    # nt_bad of them routes the whole call to the plain branch upstream)
    nt_bad = min(spec.nt_bad, bnt)
    bad_c, bad_i = jax.lax.top_k(counts, nt_bad)
    img_rows_b = (bad_i // nt * (h * w))[:, None]
    vals_b = _exact_taps(
        x_flat, img_rows_b,
        jnp.take(p["y0t"].reshape(bnt, t), bad_i, axis=0),
        jnp.take(p["x0t"].reshape(bnt, t), bad_i, axis=0),
        jnp.take(p["fyt"].reshape(bnt, t), bad_i, axis=0),
        jnp.take(p["fxt"].reshape(bnt, t), bad_i, axis=0),
        h, w, c,
    )
    if cp != c:
        vals_b = jnp.pad(vals_b, ((0, 0), (0, 0), (0, cp - c)))
    vals_b = jnp.swapaxes(vals_b, 1, 2).astype(x.dtype)  # (nt_bad, CP, T)
    keep = (bad_c > kf)[:, None, None]
    merged = jnp.where(keep, vals_b, jnp.take(out, bad_i, axis=0))
    out = out.at[bad_i].set(merged)

    out = out.reshape(b, nh, nw, cp, th, tw).transpose(0, 1, 4, 2, 5, 3)
    return out.reshape(b, nh * th, nw * tw, cp)[:, :hq, :wq, :c]


# Wide-channel (16 < C <= 64) production spec: 2 px per 128-lane unit,
# ww = 32 px / wh = 48 rows — a 16^2 query-tile footprint plus the 2 px
# x-origin quantum, bilinear halo, and smooth-warp jitter.  v5e sweep
# (tools/probe_lane_c64.py, 672^2 B=8 C=64): 51.5 ms vs 90.5 plain;
# nbuf>2 and 32^2/16x32 tiles were all slower.
_WIDE_C_SPEC = LaneSpec(xq=2, ns=16, wh=48)


def warp_sample(y: jnp.ndarray, flow: jnp.ndarray, inference: bool = True):
    """Dispatcher for the matcher's x_hat lookup (matcher.py:239).

    TPU inference at the scale-1 upsample shapes (C <= 16, big maps) routes
    to the v3 lane-packed windowed kernel above: channels packed along the
    lanes, per-tile sequential in-kernel DMA instead of the per-row gather.
    Everything else — training (needs gradients), wide channels, small
    maps, CPU — stays on the plain gather.

    History: v1 (graveyard/window_warp_v1.py) and v2
    (tile_window.windowed_warp) LOST to the plain gather because their
    window fetch was itself an XLA gather paying 640-1280 B/query of
    window-area duplication against the packed gather's ~70 B/query
    (measured v5e, 864^2 C=9 bs16: 546-975 ms vs 192 ms). v3 removes the
    gather from the window fetch entirely — the feature map reshapes (no
    data movement) to a (B, Hp/RB, RB, NJ*128) lane-packed table whose
    x-origin slices the LANE axis at jx*128, DMA-sliced per tile at
    streaming bandwidth, the regime where window duplication is ~free.

    The n >= 500_000 threshold deliberately keeps 560^2 coarse queries
    (313,600) on the plain gather: the packed gather is still in its fast
    regime there (36 ms at 560^2 bs16 vs 196 ms at 864^2 — the table fits
    the gather engine's fast path), so the kernel's fixed planning cost
    buys nothing. The win shows up where the gather collapses: 864^2
    (1.68x) and 1344^2.
    ``ROMA_DISABLE_TILE_WINDOW=1`` reverts to the plain gather (shared
    escape hatch with the windowed local correlation).
    """
    from .local_corr import _windowed_disabled

    b, h, w, c = y.shape
    n = flow.shape[1] * flow.shape[2]
    if (
        inference
        and not _windowed_disabled()
        and y.dtype in (jnp.bfloat16, jnp.float32)
        and jax.default_backend() == "tpu"
    ):
        if c <= 16 and n >= 500_000:
            return lane_warp(y, flow)
        if 16 < c <= 64 and h * w >= 400_000:
            # wide-channel variant: xq=2 px per 128-lane unit (cp=64).
            # The kernel's cost is ~3.7 us/tile regardless of map size,
            # while the plain gather's per-query cost GROWS with the
            # map's HBM footprint — so the crossover is on map area, not
            # total bytes: at 672^2 (golden 1344 config s2-up) lane wins
            # 51.5 vs 90.5 ms; at 432^2 (864 config) plain already runs
            # at its fast rate (43.5 ms) and lane only ties (v5e sweep,
            # tools/probe_lane_c64.py).
            return lane_warp(y, flow, spec=_WIDE_C_SPEC)
    return grid_sample(y, flow)
