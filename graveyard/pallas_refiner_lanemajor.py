"""Lane-major wide-channel refiner kernel — GRAVEYARD (negative result).

Extracted from roma_tpu/ops/pallas_refiner.py (round 5 package slimming);
parity test lives in tests/test_pallas_refiner.py. NOT routed by
fused_refiner_stack — measured slower than the model's scanned XLA convs
at every RoMa wide-C shape. See graveyard/README.md.

Layout (rows, W(sublanes), C(lanes)): C pads to the next 128 multiple.
The dw5x5's x-shifts become sublane rolls whose wrap-around lands in the
2-column zero margins (exact torch zero padding, no masking); y-shifts are
row slices of a strip that carries a 2-row halo on each side, delivered by
three BlockSpec views of the same padded input (tail of the previous
strip, the strip, head of the next) so input traffic is (S+4)/S, not 3x.
The 1x1 conv is a plain (S*Wp, Cp) @ (Cp, Cp) MXU matmul.

MEASURED (v5e, bs16, 9 blocks): beats a naive folded-XLA chain 1.4-2.7x,
but LOSES to the model's actual scanned bf16 conv path at every RoMa
shape (108^2 C=1137: 82 vs 46 ms; 280^2 C=144: 87 vs 51 ms) — the 25
depthwise accumulation passes over the (S, Wp, Cp) f32 strip are
VMEM-bandwidth-bound, while XLA's conv emitter tiles the same work
through registers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from roma_tpu.ops.pallas_refiner import _round_up

def _lane_kernel(
    dw_ref,   # VMEM (KK*KK, Cp) f32 folded depthwise taps
    db_ref,   # VMEM (1, Cp) f32
    w2_ref,   # VMEM (Cp, Cp) io-dtype
    b2_ref,   # VMEM (1, Cp) f32
    prev_ref,  # VMEM (1, HALO, Wp, Cp)
    cur_ref,   # VMEM (1, S, Wp, Cp)
    next_ref,  # VMEM (1, HALO, Wp, Cp)
    o_ref,     # VMEM (1, S, Wp, Cp)
    strip,     # scratch VMEM (S + 2*HALO, Wp, Cp) f32
    *,
    s_rows: int,
    kk: int,
    w: int,
):
    halo = kk // 2
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    wp = cur_ref.shape[2]

    strip[pl.ds(0, halo)] = jnp.where(
        i == 0, 0.0, prev_ref[0].astype(jnp.float32)
    )
    strip[pl.ds(halo, s_rows)] = cur_ref[0].astype(jnp.float32)
    strip[pl.ds(halo + s_rows, halo)] = jnp.where(
        i == ni - 1, 0.0, next_ref[0].astype(jnp.float32)
    )

    acc = jnp.zeros((s_rows, wp, strip.shape[2]), jnp.float32)
    for v in range(kk):
        # one sublane roll per x-offset, reused by all 5 y-offsets; the
        # wrap-around lands in the 2-column zero margins (exact zero pad)
        rolled = pltpu.roll(strip[...], (halo - v) % wp, axis=1)
        for u in range(kk):
            acc = acc + rolled[u : u + s_rows] * dw_ref[u * kk + v, :][None, None, :]
    acc = jnp.maximum(acc + db_ref[0][None, None, :], 0.0)

    y = jax.lax.dot_general(
        acc.reshape(s_rows * wp, -1).astype(w2_ref.dtype),
        w2_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0][None, :]
    y = y.reshape(s_rows, wp, -1)
    # re-zero the x margins so the next block's roll wrap stays exact
    col = jax.lax.broadcasted_iota(jnp.int32, (s_rows, wp, 1), 1)
    y = jnp.where((col >= halo) & (col < halo + w), y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


def _lane_block(x, blk, s_rows: int, interpret=False):
    """One folded refiner block on (B, H, W, C) via the lane-major kernel."""
    b, h, w, c = x.shape
    kk = blk["dw"].shape[0]
    halo = kk // 2
    cp = _round_up(c, 128)
    wp = _round_up(w + 2 * halo, 8)
    hp = -(-h // s_rows) * s_rows
    dt = x.dtype

    xp = jnp.zeros((b, hp, wp, cp), dt)
    xp = jax.lax.dynamic_update_slice(xp, x, (0, 0, halo, 0))

    dw = jnp.zeros((kk * kk, cp), jnp.float32)
    dw = jax.lax.dynamic_update_slice(
        dw, blk["dw"].reshape(kk * kk, c).astype(jnp.float32), (0, 0)
    )
    db = jnp.zeros((1, cp), jnp.float32).at[0, :c].set(blk["db"])
    w2 = jnp.zeros((cp, cp), dt)
    w2 = jax.lax.dynamic_update_slice(w2, blk["w2"].astype(dt), (0, 0))
    b2 = jnp.zeros((1, cp), jnp.float32).at[0, :c].set(blk["b2"])

    n_strips = hp // s_rows
    hb = s_rows // halo  # halo blocks per strip (s_rows must divide by halo)

    out = pl.pallas_call(
        functools.partial(_lane_kernel, s_rows=s_rows, kk=kk, w=w),
        grid=(b, n_strips),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            # previous strip's tail (rows [i*S-halo, i*S)): halo-row blocks
            pl.BlockSpec(
                (1, halo, wp, cp),
                lambda bi, i: (bi, jnp.maximum(i * hb - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s_rows, wp, cp), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # next strip's head (rows [i*S+S, i*S+S+halo))
            pl.BlockSpec(
                (1, halo, wp, cp),
                lambda bi, i, n=n_strips: (
                    bi, jnp.minimum((i + 1) * hb, n * hb - 1), 0, 0
                ),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, s_rows, wp, cp), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, cp), dt),
        scratch_shapes=[pltpu.VMEM((s_rows + 2 * halo, wp, cp), jnp.float32)],
        interpret=interpret,
    )(dw, db, w2, b2, xp, xp, xp)
    return out[:, :h, halo : halo + w, :c]


def lane_refiner_stack(x, blocks, interpret=False):
    """Folded refiner chain for wide channels, one lane-major launch/block."""
    c = x.shape[-1]
    w = x.shape[2]
    # f32 working set per step is strip (S+4) + rolled (S+4) + acc (S) rows
    # of (Wp, Cp): keep it ~9 MB inside the 16 MB VMEM scope
    cp = _round_up(c, 128)
    wp = _round_up(w + 4, 8)
    s = (9_000_000 // (4 * wp * cp) - 8) // 3
    s = max(4, min(32, (s // 4) * 4))  # multiple of halo(=2), bounded
    for blk in blocks:
        x = _lane_block(x, blk, s, interpret=interpret)
    return x

