"""Fused ConvRefiner stack kernel (Pallas TPU).

One RefinerBlock = depthwise 5x5 conv -> BatchNorm -> ReLU -> 1x1 conv
(reference romatch/models/matcher.py:92-122). At inference the BN is an
affine per-channel map, so it folds into the depthwise conv, and the whole
hidden stack (block1 + 8 identical blocks) runs as ONE kernel over row
strips, entirely VMEM-resident between blocks:

    for each of 9 blocks:  dw5x5 (25 rolled FMAs) -> +bias/ReLU -> 1x1

XLA's lowering of this stack is the decoder's second-largest cost after the
gathers (measured round 2, v5e, bs8 560->864 two-pass): at the fine scales
the channel counts are narrow (scale 1: C=24) and XLA's NHWC convs waste
81% of the 128-wide vector lanes and round-trip HBM between every op
(864^2 x C24 x 9 blocks: 340 ms, ~10x off the VPU+HBM roofline).

Kernel design (C <= 32, the scale-1 refiners):
  * channel-major strips (C, rows, W): W on lanes, rows on sublanes — full
    lane utilization independent of C. C lives on the untiled leading dim.
  * halo fusion: strips carry 2*n_blocks halo rows; each block's conv
    shrinks the valid region by 2 rows, so the strip center stays exact and
    inter-block activations never touch HBM. Total traffic for 9 blocks =
    one read of ~2x the tensor + one write (vs 18 full passes unfused).
  * the depthwise taps are double rolls (sublane roll for dy, lane roll for
    dx). Wrap-around lands only in the >=2-row/col zero margins, which
    reproduces torch zero SAME padding; out-of-image rows/cols are re-zeroed
    after every block so chained blocks keep exact padding semantics.
  * per-channel work is a fori_loop over C; weights are SMEM scalars
    (dw: 25 FMAs/channel; 1x1: C scalar-broadcast plane FMAs per output
    channel). C^2 = 576 plane ops cost far less than 81% lane waste.
  * the dw+ReLU stage runs in place (channel c reads only channel c), so two
    ping-pong buffers cover the whole stack.

Wider channel counts (scales 2-16) stay on XLA: with C >= 128 the lanes are
fully used and XLA's conv+matmul lowering is within ~2x of roofline, while
this kernel's scalar 1x1 loop would need C^2 >= 20k plane ops.

Weights arrive in the Flax module layout (conv1/bn/conv2); BN folding
happens in f32 outside the kernel. Forward-only: training uses the XLA path
(BN batch stats + autodiff).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BN_EPS = 1e-5


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def fold_block(dw_kernel, dw_bias, bn_scale, bn_bias, bn_mean, bn_var, w2, b2):
    """Fold inference BatchNorm into the depthwise conv (all f32).

    dw_kernel: (K, K, 1, C) flax layout; w2: (1, 1, C, C) or (C, C).
    Returns dict(dw=(K, K, C), db=(C,), w2=(C, C), b2=(C,)).
    """
    s = bn_scale.astype(jnp.float32) * jax.lax.rsqrt(
        bn_var.astype(jnp.float32) + _BN_EPS
    )
    dw = dw_kernel.astype(jnp.float32).reshape(
        dw_kernel.shape[0], dw_kernel.shape[1], -1
    )
    db = (dw_bias.astype(jnp.float32) - bn_mean.astype(jnp.float32)) * s
    db = db + bn_bias.astype(jnp.float32)
    w2 = w2.astype(jnp.float32).reshape(w2.shape[-2], w2.shape[-1])
    return dict(dw=dw * s, db=db, w2=w2, b2=b2.astype(jnp.float32))


# ---------------------------------------------------------------------------
# reference XLA path (same folded math; wide-C path + kernel parity target)
# ---------------------------------------------------------------------------


def refiner_stack_reference(x: jnp.ndarray, blocks: list[dict]):
    """x (B, H, W, C) -> (B, H, W, C), folded-BN math in XLA."""
    k = blocks[0]["dw"].shape[0]
    p = k // 2
    h, w = x.shape[1], x.shape[2]
    dt = x.dtype
    for blk in blocks:
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        acc = jnp.zeros(x.shape, jnp.float32)
        for u in range(k):
            for v in range(k):
                acc = acc + xp[:, u : u + h, v : v + w, :].astype(
                    jnp.float32
                ) * blk["dw"][u, v]
        y = jnp.maximum(acc + blk["db"], 0.0).astype(dt)
        x = (
            jnp.einsum(
                "bhwc,cd->bhwd", y, blk["w2"].astype(dt),
                preferred_element_type=jnp.float32,
            )
            + blk["b2"]
        ).astype(dt)
    return x


# ---------------------------------------------------------------------------
# fused cmajor kernel
# ---------------------------------------------------------------------------


def _cmajor_kernel(
    dw_ref,  # SMEM (NB*C, KK*KK) f32
    db_ref,  # SMEM (NB, C) f32
    w2_ref,  # VMEM (NB, C, C) f32, pre-transposed to (out, in)
    b2_ref,  # SMEM (NB, C) f32
    x_ref,  # VMEM (1, C, R, WP) strip with halo, in dtype
    o_ref,  # VMEM (1, C, S, WP)
    buf_a,  # VMEM (C, R, WP) in dtype
    buf_b,  # VMEM (C, R, WP) in dtype
    *,
    nb: int,
    cdim: int,
    kk: int,
    s_rows: int,
    halo: int,
    h: int,
    w: int,
):
    i = pl.program_id(1)
    p = kk // 2
    r_rows = x_ref.shape[3]
    wp = x_ref.shape[4]
    dt = buf_a.dtype

    # out-of-image mask in strip coordinates (global row = i*S + r - halo)
    rows = jax.lax.broadcasted_iota(jnp.int32, (r_rows, wp), 0) + (
        i * s_rows - halo
    )
    cols = jax.lax.broadcasted_iota(jnp.int32, (r_rows, wp), 1)
    mask = (rows >= 0) & (rows < h) & (cols < w)

    def dw_stage(k, src_at, dst):
        """dst[c] = relu(dw_k(src_at(c))) for all c. In-place safe.

        The lane roll distributes over the dy-sum for a fixed dx:
            y = sum_v roll_x(sum_u w[u,v] * roll_y(x, u), v)
        so each channel costs kk sublane rolls + kk lane rolls + kk^2 FMAs
        instead of kk + kk^2 rolls.
        """

        def body(c, _):
            x2 = src_at(c).astype(jnp.float32)  # rolls require 32-bit data
            acc_v = []
            for u in range(kk):
                xr = pltpu.roll(x2, (p - u) % r_rows, axis=0)
                for v in range(kk):
                    t = xr * dw_ref[k * cdim + c, u * kk + v]
                    if u == 0:
                        acc_v.append(t)
                    else:
                        acc_v[v] = acc_v[v] + t
            acc = jnp.zeros((r_rows, wp), jnp.float32)
            for v in range(kk):
                acc = acc + pltpu.roll(acc_v[v], (p - v) % wp, axis=1)
            acc = jnp.maximum(acc + db_ref[k, c], 0.0)
            dst[pl.ds(c, 1)] = acc.astype(dt)[None]
            return _

        jax.lax.fori_loop(0, cdim, body, None)

    def pw_stage(k, src, dst):
        """dst = mask * (w2 @ src + b2): one MXU matmul over (C, R*WP)."""
        xall = src[...].astype(jnp.float32).reshape(cdim, r_rows * wp)
        y = jax.lax.dot_general(
            w2_ref[k], xall, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(cdim, r_rows, wp)
        for c in range(cdim):  # static unroll: bias + padding re-zero
            dst[pl.ds(c, 1)] = jnp.where(mask, y[c] + b2_ref[k, c], 0.0).astype(
                dt
            )[None]

    dw_stage(0, lambda c: x_ref[0, 0, pl.ds(c, 1)][0], buf_a)
    pw_stage(0, buf_a, buf_b)
    cur, other = buf_b, buf_a
    for k in range(1, nb):
        dw_stage(k, lambda c: cur[pl.ds(c, 1)][0], cur)
        pw_stage(k, cur, other)
        cur, other = other, cur

    # strip center (first S rows of the valid region start at halo)
    out_f = pltpu.roll(cur[:].astype(jnp.float32), (r_rows - halo) % r_rows, axis=1)
    o_ref[0, 0] = out_f[:, :s_rows, :].astype(dt)


def _fused_cmajor(x, blocks, interpret=False, s_rows=32):
    """x (B, H, W, C) NHWC -> NHWC; C <= 32."""
    bsz, h, w, c = x.shape
    nb = len(blocks)
    kk = blocks[0]["dw"].shape[0]
    p = kk // 2
    halo = p * nb
    wp = _round_up(w + p, 128)
    s_rows = min(s_rows, _round_up(h, 8))
    n = -(-h // s_rows)
    r_rows = s_rows + 2 * halo

    xt = jnp.transpose(x, (0, 3, 1, 2))  # (B, C, H, W)
    xpad = jnp.zeros((bsz, c, n * s_rows + 2 * halo, wp), x.dtype)
    xpad = jax.lax.dynamic_update_slice(xpad, xt, (0, 0, halo, 0))
    strips = jnp.stack(
        [xpad[:, :, i * s_rows : i * s_rows + r_rows, :] for i in range(n)],
        axis=1,
    )  # (B, n, C, R, WP)

    dw = jnp.stack([b["dw"] for b in blocks])  # (NB, K, K, C)
    dw = dw.transpose(0, 3, 1, 2).reshape(nb * c, kk * kk)
    db = jnp.stack([b["db"] for b in blocks])  # (NB, C)
    w2 = jnp.stack([b["w2"].T for b in blocks])  # (NB, C_out, C_in)
    b2 = jnp.stack([b["b2"] for b in blocks])

    kern = functools.partial(
        _cmajor_kernel,
        nb=nb, cdim=c, kk=kk, s_rows=s_rows, halo=halo, h=h, w=w,
    )
    out = pl.pallas_call(
        kern,
        grid=(bsz, n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, c, r_rows, wp),
                lambda b, i: (b, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, c, s_rows, wp),
            lambda b, i: (b, i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, n, c, s_rows, wp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, r_rows, wp), x.dtype),
            pltpu.VMEM((c, r_rows, wp), x.dtype),
        ],
        interpret=interpret,
    )(dw, db, w2, b2, strips)
    out = out.transpose(0, 2, 1, 3, 4).reshape(bsz, c, n * s_rows, wp)
    return jnp.transpose(out[:, :, :h, :w], (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# packed channel-major kernel — whole-tensor ops instead of per-channel loops
# ---------------------------------------------------------------------------
#
# Hypothesis (round 4): the per-channel fori_loop of _cmajor_kernel is
# VPU-op-overhead-bound (~890 small (R, WP) vector ops per block-strip), so
# operating on channel CHUNKS — pltpu.roll on a (cg, R, WP) value rolls each
# channel's plane independently, per-channel dw weights broadcast as
# (cg, 1, 1) — should win by issuing ~170 large ops instead.
#
# MEASURED NEGATIVE (v5e, 560^2 C=24 9 blocks): packed s16/cg8 75.2 ms vs
# per-channel s40 55.8 ms — but normalizing halo redundancy (packed only
# fits s_rows=16: (16+12)/16 = 1.75x vs s40's 52/40 = 1.3x) gives
# 75.2 * 1.3/1.75 = 55.9 ms: per-useful-row throughput is IDENTICAL. The
# kernel is VMEM-BANDWIDTH-bound (35 f32 tensor passes per block), not
# op-overhead-bound, and the packed form's 5 concurrent f32 accumulators
# push scoped VMEM over 16 MB at s_rows >= 24 (compile OOM), so it cannot
# buy back the halo amortization. bf16 passes would halve the bytes, but
# pltpu.roll on bf16 fails Mosaic compilation (sublane (2,1) packing).
# Kept as a parity-pinned documented experiment; the dispatcher routes the
# per-channel kernel.


def _cmajor_packed_kernel(
    dwv_ref,  # VMEM (NB, KK*KK, C, 1, 1) f32
    dbv_ref,  # VMEM (NB, C, 1, 1) f32
    w2_ref,   # VMEM (NB, C, C) f32, pre-transposed to (out, in)
    b2v_ref,  # VMEM (NB, C, 1, 1) f32
    x_ref,    # VMEM (1, 1, C, R, WP) strip with halo, in dtype
    o_ref,    # VMEM (1, 1, C, S, WP)
    buf,      # VMEM scratch (C, R, WP) f32
    *,
    nb: int,
    cdim: int,
    kk: int,
    s_rows: int,
    halo: int,
    h: int,
    w: int,
    cg: int,
):
    i = pl.program_id(1)
    p = kk // 2
    r_rows = x_ref.shape[3]
    wp = x_ref.shape[4]
    dt = o_ref.dtype

    rows = jax.lax.broadcasted_iota(jnp.int32, (r_rows, wp), 0) + (
        i * s_rows - halo
    )
    cols = jax.lax.broadcasted_iota(jnp.int32, (r_rows, wp), 1)
    maskf = ((rows >= 0) & (rows < h) & (cols < w)).astype(jnp.float32)

    buf[...] = x_ref[0, 0].astype(jnp.float32)

    for k in range(nb):
        # depthwise 5x5 + bias + ReLU, channel chunks of cg. Same loop
        # order as the per-channel kernel (sublane roll per dy shared by
        # all dx taps, lane rolls deferred): kk + kk roll passes per chunk
        # instead of kk^2, and bit-identical f32 summation order.
        for c0 in range(0, cdim, cg):
            n_c = min(cg, cdim - c0)
            xc = buf[pl.ds(c0, n_c)]  # (n_c, R, WP) f32
            acc_v = [None] * kk
            for u in range(kk):
                xr = pltpu.roll(xc, (p - u) % r_rows, axis=1)
                for v in range(kk):
                    t = xr * dwv_ref[k, u * kk + v, pl.ds(c0, n_c)]
                    acc_v[v] = t if u == 0 else acc_v[v] + t
            acc = None
            for v in range(kk):
                r = pltpu.roll(acc_v[v], (p - v) % wp, axis=2)
                acc = r if acc is None else acc + r
            acc = jnp.maximum(acc + dbv_ref[k, pl.ds(c0, n_c)], 0.0)
            # round-trip through the io dtype: the per-channel kernel stores
            # dt between stages, so this stays a bit-exact drop-in for it
            buf[pl.ds(c0, n_c)] = acc.astype(dt).astype(jnp.float32)
        # 1x1 over all channels: (C, C) @ (C, R*WP) on the MXU
        y = jax.lax.dot_general(
            w2_ref[k], buf[...].reshape(cdim, r_rows * wp),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(cdim, r_rows, wp)
        y = (y + b2v_ref[k]) * maskf[None]
        buf[...] = y.astype(dt).astype(jnp.float32)

    out = pltpu.roll(buf[...], (r_rows - halo) % r_rows, axis=1)
    o_ref[0, 0] = out[:, :s_rows, :].astype(dt)


def _fused_cmajor_packed(x, blocks, interpret=False, s_rows=32, cg=8):
    """x (B, H, W, C) NHWC -> NHWC via the packed kernel; C <= 32."""
    bsz, h, w, c = x.shape
    nb = len(blocks)
    kk = blocks[0]["dw"].shape[0]
    p = kk // 2
    halo = p * nb
    wp = _round_up(w + p, 128)
    s_rows = min(s_rows, _round_up(h, 8))
    n = -(-h // s_rows)
    r_rows = s_rows + 2 * halo

    xt = jnp.transpose(x, (0, 3, 1, 2))  # (B, C, H, W)
    xpad = jnp.zeros((bsz, c, n * s_rows + 2 * halo, wp), x.dtype)
    xpad = jax.lax.dynamic_update_slice(xpad, xt, (0, 0, halo, 0))
    strips = jnp.stack(
        [xpad[:, :, i * s_rows : i * s_rows + r_rows, :] for i in range(n)],
        axis=1,
    )  # (B, n, C, R, WP)

    dwv = jnp.stack([b["dw"] for b in blocks])  # (NB, K, K, C)
    dwv = dwv.transpose(0, 3, 1, 2).reshape(nb, c, kk * kk)
    dwv = dwv.transpose(0, 2, 1)[..., None, None]  # (NB, KK*KK, C, 1, 1)
    dbv = jnp.stack([b["db"] for b in blocks])[..., None, None]
    w2 = jnp.stack([b["w2"].T for b in blocks])  # (NB, C_out, C_in)
    b2v = jnp.stack([b["b2"] for b in blocks])[..., None, None]

    kern = functools.partial(
        _cmajor_packed_kernel,
        nb=nb, cdim=c, kk=kk, s_rows=s_rows, halo=halo, h=h, w=w, cg=cg,
    )
    out = pl.pallas_call(
        kern,
        grid=(bsz, n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, c, r_rows, wp),
                lambda b, i: (b, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, c, s_rows, wp),
            lambda b, i: (b, i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, n, c, s_rows, wp), x.dtype),
        scratch_shapes=[pltpu.VMEM((c, r_rows, wp), jnp.float32)],
        interpret=interpret,
    )(dwv, dbv, w2, b2v, strips)
    out = out.transpose(0, 2, 1, 3, 4).reshape(bsz, c, n * s_rows, wp)
    return jnp.transpose(out[:, :, :h, :w], (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

CMAJOR_MAX_C = 32
LANE_MAX_C = 1536


def fused_refiner_stack(
    x: jnp.ndarray,
    blocks: list[dict],
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Run a chain of folded refiner blocks on (B, H, W, C); same shape out.

    Narrow-C stacks (C <= 32) use the fused Pallas kernel on TPU; everything
    else (and non-TPU backends) uses the XLA folded path. Pass
    ``interpret=True`` to force the kernel in interpreter mode for tests.
    (Two wide-C kernel attempts are NOT routed here — measured slower than
    the model's scanned XLA convs at the wide-C scales; see
    graveyard/pallas_refiner_lanemajor.py and graveyard/pallas_hcw_refiner.py.)
    """
    c = x.shape[-1]
    use_kernel = c <= CMAJOR_MAX_C and len(blocks) > 0
    if interpret is None:
        if jax.default_backend() != "tpu" or not use_kernel:
            return refiner_stack_reference(x, blocks)
        interpret = False
    elif not use_kernel:
        return refiner_stack_reference(x, blocks)
    # Chunk the stack: halo rows grow with blocks-per-call (2 rows/block on
    # both sides), so deep stacks pay a large redundant-compute factor
    # ((s+4g)/s per chunk of g blocks). One extra HBM round-trip per chunk
    # (~1 ms at 864^2) buys halo 18 -> 6, a ~1.8x vector-op reduction.
    # s_rows=40 fills the 16 MB VMEM scope for bf16 at the 864-wide strips
    # it was tuned on; wider maps (1344 eval config -> WP=1408) scale the
    # strip rows down to stay inside the scope, f32 halves again.
    wp = _round_up(x.shape[2] + 2, 128)
    # v5e sweep (9-block C=24 stack, bs16@864 / bs8@1344, probe_s1up_v2):
    #   864:  g3/s28 109.8 ms, g2/s40 110.3, g3/s40 124.4 (old default),
    #         g3/s16 156.1
    #   1344: g2/s16 140.7 ms, g3/s12 165.5, g3/s16 194.3 (old default)
    # Wide maps want SHALLOWER chunks: the halo redundancy factor
    # (s + 4g)/s is paid on every one of wp lanes, so at 1408 lanes the
    # extra HBM round-trip of g=2 (5 chunks vs 3) costs less than g=3's
    # deeper halos at the rows that still fit VMEM.
    g = 3 if wp <= 1024 else 2
    # the pw stage's f32 strip copies scale with wp while the halo rows
    # don't, so the row budget shrinks faster than 1/wp. Empirical anchors
    # (measured OOMs on v5e): bf16 g3 s=40 fits at wp=896 (but s=28 is
    # faster), s=48 does NOT; bf16 g2 s=16 fits at wp=1408; f32 s=20 does
    # NOT fit at wp=896.
    if x.dtype.itemsize <= 2:
        base = 28 if g == 3 else 40
    else:
        base = 10
    # No 8-row floor: the quadratic budget model must govern — at f32
    # wp=1408 it allows only ~4 rows and forcing 8 would re-risk the OOM
    # this logic exists to prevent (tiny strips just pay more halo
    # redundancy, which is slow-but-correct).
    s_rows = max(2, min(base, int(base * (896 / wp) ** 2)))
    for i in range(0, len(blocks), g):
        x = _fused_cmajor(x, blocks[i : i + g], interpret=interpret, s_rows=s_rows)
    return x


def fold_refiner_tree(params, batch_stats) -> list[dict]:
    """Fold a ConvRefiner's block1 + scan-stacked hidden blocks into the
    kernel's folded-block list (params/batch_stats = that module's subtrees)."""
    def fold(p, s):
        return fold_block(
            p["conv1"]["kernel"], p["conv1"]["bias"],
            p["bn"]["scale"], p["bn"]["bias"],
            s["bn"]["mean"], s["bn"]["var"],
            p["conv2"]["kernel"], p["conv2"]["bias"],
        )

    blocks = [fold(params["block1"], batch_stats["block1"])]
    hp, hs = params["hidden"]["block"], batch_stats["hidden"]["block"]
    for i in range(hp["conv1"]["kernel"].shape[0]):
        blocks.append(fold(
            jax.tree.map(lambda a: a[i], hp), jax.tree.map(lambda a: a[i], hs)
        ))
    return blocks
