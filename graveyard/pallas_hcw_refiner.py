"""Wide-channel fused refiner block — (B, H, C, W) layout Pallas kernel.

Second attack on the wide-C ConvRefiner stacks (reference
romatch/models/matcher.py:92-122; scales 2..16, C in {144, 569, 1137,
1377}), after the documented lane-major negative result
(ops/pallas_refiner.py): that variant put W on sublanes / C on lanes and
lost to XLA's scanned convs because its 25 depthwise accumulation passes
ran over f32 strips at VMEM bandwidth.

This design transposes the problem: activations live as (B, H, C, W) —
**C on sublanes, W on lanes** — so

  * the depthwise 5x5's per-channel weights become (C, 1) sublane vectors:
    each tap is ONE broadcast-FMA over the (C, W) plane (25 taps total),
    no per-channel scalar loop, no wide-strip passes;
  * dx taps are static lane slices of a 2-col-haloed row, dy taps read
    neighbor rows of a strip DMA'd with a 2-row halo (halo rows come from
    the same HBM buffer via leading-dim slicing — no overlapping
    BlockSpecs, no 3-view trick);
  * the 1x1 conv is one (C, C) @ (C, W) MXU dot per output row — K = C >=
    569 keeps the MXU fully fed;
  * BatchNorm is folded (inference), ReLU fuses into the dw accumulate.

Each block reads/writes HBM once (plus the one-time NHWC<->NHCW transposes
around the 9-block chain); intermediate dw/ReLU activations never leave
VMEM.

Forward-only (the training path keeps flax/XLA convs + autodiff).

MEASURED (v5e, bs16, 9 blocks, bf16) — second NEGATIVE result for the
wide-C bucket, after the lane-major one (ops/pallas_refiner.py):

  * s2-up 432^2 C=144: XLA scanned 112.4 ms, this kernel 198.1 ms (0.57x)
  * s2-c  280^2 C=144: XLA scanned  46.2 ms, this kernel 109.1 ms (0.42x)
  * C >= 569 does not compile: even with the 128-channel-chunked row body
    and the 8-aligned channel pad, Mosaic aborts the remote compile-helper
    subprocess at C in {569, 1137, 1377} (HTTP 500, exit code 1 — compiler
    crash, not a lowering diagnostic we can act on). XLA scanned stacks at
    those shapes for the record: s8-up 108^2 C=1137 47.1 ms, s4-up 216^2
    C=569 72.3 ms, s16 35^2 C=1377 9.0 ms, s8-c 70^2 C=1137 20.7 ms,
    s4-c 140^2 C=569 30.7 ms.

Roofline context, which is the real finding: the stacks' cost is the 1x1
convs — C^2 MACs/pixel x 9 blocks ~= 14.7 TFLOP bf16 per two-pass batch
across scales 2..16 — and XLA's scanned path already runs s8-up
(4.3 TFLOP) in 43.9 ms ~= 98 TFLOP/s ~= 50% of v5e bf16 peak, i.e. within
~1.3x of what a hand kernel could realistically sustain with DMA + dw
overlap. At C=144 the stacks are HBM-pass-bound instead, and this
per-block design pays the same 9 x read+write traffic as XLA while adding
VPU broadcast-FMA cost — chaining >=3 blocks VMEM-resident (halo growth
2 rows/side/block) is the only remaining lever there, worth ~2x of the
~160 ms s2 bucket at best. Kept as a parity-tested experiment; NOT routed
by matcher.ConvRefiner (the C<=32 channel-major kernel in pallas_refiner
remains the only routed refiner kernel).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _block_kernel(
    wts_ref,   # VMEM (C, 32) f32: [:, :25] dw taps (u*5+v), [:, 25] db, [:, 26] b2
    w2_ref,    # VMEM (C, C) io-dtype, (out, in)
    x_ref,     # ANY (B, Hp, C, Wp)  Hp = H + 4, zero rows top/bottom
    o_ref,     # VMEM (1, S, C, Wp)
    strip, sems,  # scratch: (2, S+4, C, Wp) io-dtype, DMA sems (2,)
    *, s_rows: int, c: int, w: int, kk: int,
):
    bi = pl.program_id(0)
    si = pl.program_id(1)
    ns = pl.num_programs(1)
    p = kk // 2
    wp = o_ref.shape[3]
    r_rows = s_rows + 2 * p
    f32 = jnp.float32

    step = bi * ns + si
    slot = jax.lax.rem(step, 2)

    def start(bj, sj, sl):
        pltpu.make_async_copy(
            x_ref.at[bj, pl.ds(sj * s_rows, r_rows)], strip.at[sl], sems.at[sl]
        ).start()

    @pl.when(step == 0)
    def _():
        start(bi, si, slot)

    @pl.when(step + 1 < pl.num_programs(0) * ns)
    def _():
        wrap = si + 1 == ns
        start(jnp.where(wrap, bi + 1, bi), jnp.where(wrap, 0, si + 1), 1 - slot)

    pltpu.make_async_copy(
        x_ref.at[0, pl.ds(0, r_rows)], strip.at[slot], sems.at[slot]
    ).wait()

    b2 = wts_ref[:, kk * kk + 1 : kk * kk + 2]
    cch = 128  # channel chunk: bounds the kernel's f32 temporaries (the
    # full-C formulation crashed the compiler at C >= 569 — measured)

    def row(h, _):
        # per channel chunk: dw+ReLU on (cch, Wp), then accumulate the 1x1
        # as (C, cch) @ (cch, Wp). The lane roll distributes over the
        # dy-sum for a fixed dx -> kk^2 broadcast-FMAs + kk rolls per
        # chunk; wrap-around lands in the >=2 zero margin cols (torch
        # zero padding).
        out = jnp.zeros((c, wp), f32)
        for c0 in range(0, c, cch):
            cw = min(cch, c - c0)
            csl = pl.ds(c0, cw)
            tvs = None
            for u in range(kk):
                xr = strip[slot, h + u, csl].astype(f32)   # (cw, Wp)
                taps = [
                    xr * wts_ref[csl, u * kk + v : u * kk + v + 1]
                    for v in range(kk)
                ]
                tvs = taps if tvs is None else [a + b for a, b in zip(tvs, taps)]
            acc = jnp.zeros((cw, wp), f32)
            for v in range(kk):
                acc = acc + pltpu.roll(tvs[v], (p - v) % wp, axis=1)
            db_c = wts_ref[csl, kk * kk : kk * kk + 1]
            y = jnp.maximum(acc + db_c, 0.0).astype(w2_ref.dtype)
            out = out + jax.lax.dot_general(
                w2_ref[:, csl], y, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        out = out + b2
        # re-zero the x margins so the NEXT block's roll wrap stays exact
        col = jax.lax.broadcasted_iota(jnp.int32, (c, wp), 1)
        out = jnp.where(col < w, out, 0.0)
        o_ref[0, h] = out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, s_rows, row, 0)


def _hcw_block(x, blk, s_rows: int, interpret: bool = False):
    """One folded block on (B, H, C, Wp) (margins already zeroed).

    Returns same shape. x's W dim = wp (>= w + 2, 128-mult); ``w`` is the
    true width; cols >= w are zero and stay zero.
    """
    b, h, c, wp = x.shape
    kk = blk["dw"].shape[0]
    p = kk // 2
    w = blk["w"]
    ct = blk["dw"].shape[-1]  # true channel count (c may be 8-padded)
    ns = -(-h // s_rows)
    hp = ns * s_rows + 2 * p
    xp = jnp.zeros((b, hp, c, wp), x.dtype)
    xp = jax.lax.dynamic_update_slice(xp, x, (0, p, 0, 0))

    wts = jnp.zeros((c, 32), jnp.float32)
    wts = wts.at[:ct, : kk * kk].set(
        blk["dw"].reshape(kk * kk, ct).T.astype(jnp.float32)
    )
    wts = wts.at[:ct, kk * kk].set(blk["db"])
    wts = wts.at[:ct, kk * kk + 1].set(blk["b2"])
    w2 = jnp.zeros((c, c), x.dtype).at[:ct, :ct].set(
        blk["w2"].astype(x.dtype)
    )  # (out, in) after transpose below

    out = pl.pallas_call(
        functools.partial(
            _block_kernel, s_rows=s_rows, c=c, w=w, kk=kk
        ),
        grid=(b, ns),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, s_rows, c, wp), lambda bi, si: (bi, si, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, ns * s_rows, c, wp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, s_rows + 2 * p, c, wp), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(wts, w2.T, xp)
    return out[:, :h]


def hcw_refiner_stack(x, blocks, interpret: bool = False, s_rows: int | None = None):
    """Folded refiner chain on NHWC ``x`` via the (B, H, C, W) kernel.

    x: (B, H, W, C); blocks: list of dicts from pallas_refiner.fold_block.
    """
    b, h, w, c = x.shape
    wp = _round_up(w + 2 * 2, 128)
    # Mosaic requires the leading-dim HBM strip slice's sublane dim (C) to
    # be 8-aligned; zero-pad channels (zero dw/db/w2/b2 rows keep padded
    # channels exactly zero through every block).
    cp = _round_up(c, 8)
    xt = jnp.transpose(x, (0, 1, 3, 2))  # (B, H, C, W)
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, cp - c), (0, wp - w)))
    if s_rows is None:
        # VMEM: double-buffered strip (2*(s+4) rows) + double-buffered out
        # block (2*s rows) + w2, under ~12 MB
        itemsize = x.dtype.itemsize
        row_bytes = c * wp * itemsize
        budget = 12 * 1024 * 1024 - c * c * itemsize
        s_rows = max(4, min(32, budget // (4 * row_bytes) - 2))
    for blk in blocks:
        blk = dict(blk, w=w)
        xt = _hcw_block(xt, blk, s_rows, interpret=interpret)
    return jnp.transpose(xt[:, :, :c, :w], (0, 1, 3, 2))
