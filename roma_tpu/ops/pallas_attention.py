"""Pallas fused attention for the ViT paths.

Replaces the XLA einsum-softmax attention for DINOv2/TransformerDecoder on
TPU: at RoMa's sequence lengths (~1.6k tokens) the (B, H, N, N) f32 logits
are pure HBM traffic (~2.6GB per ViT-L block at batch 16). This kernel keeps
each query block's logits in VMEM — K/V for one batch-head fit comfortably —
so HBM sees only Q/K/V/O.

Not a streaming flash-attention: N is small enough that the full (BLOCK_Q, N)
logit tile lives in VMEM, which is simpler and just as fast here. No masking
beyond the sequence-padding mask (RoMa attention is always dense/unmasked —
reference transformer/layers/attention.py:50-63).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 256


def _softmax_masked(logits, kpad: int, n_valid: int):
    """Softmax over the first ``n_valid`` columns; columns >= n_valid get
    probability exactly 0 (e = 0), so padded K/V rows of ANY content are
    inert. Returns UNNORMALIZED probs and the denominator (BQ, 1); the
    divide happens on the (BQ, D) output instead of the (BQ, Npad) probs.

    An earlier revision corrected the denominator analytically instead of
    masking, assuming padded K rows are exactly zero. That assumption only
    holds for the FIRST block of a padded token stack: from block 2 on the
    padded rows drift non-zero (a padded row's attention output is a
    weighted average of valid V rows, and LayerNorm beta re-biases zeros),
    so their logits are arbitrary and the correction was wrong for every
    later block. The iota compare + select costs ~2 VPU ops per logit
    (~0.4 ms across a full ViT-L coarse pass) — irrelevant next to the
    correctness bar.
    """
    if kpad != n_valid:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < n_valid, logits, -jnp.inf)
    # True row max (not clamped at 0): with a 0-clamp, a row whose valid
    # logits are all < ~-87 underflows every exp and yields denom = 0 ->
    # NaN, where jax.nn.softmax stays finite. n_valid >= 1 keeps m finite.
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    return e, denom


def _attn_kernel(n_valid: int, scale: float, block_q: int, q_ref, k_ref, v_ref, o_ref):
    """One batch-head per grid step; q-blocks loop INSIDE the kernel (a
    (bh, nq) grid pays ~2.5 us/step of sequencing overhead, which dominated
    the whole kernel at RoMa's sizes — 1792 steps for DINOv2 bs16)."""
    k = k_ref[0].astype(jnp.float32)  # (Npad, D)
    v = v_ref[0]                      # (Npad, D)
    kpad = k.shape[0]
    nq = q_ref.shape[1] // block_q

    def body(j, _):
        q = q_ref[0, pl.ds(j * block_q, block_q)].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BQ, Npad)
        e, denom = _softmax_masked(logits, kpad, n_valid)
        pv = jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, pl.ds(j * block_q, block_q)] = (pv / denom).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nq, body, 0)


def _attn_bwd_kernel(
    n_valid: int, scale: float, block_q: int,
    q_ref, k_ref, v_ref, do_ref,
    dq_ref, dk_ref, dv_ref,
):
    """Recompute-backward, one batch-head per grid step (q-block loop
    inside, like the forward). The softmax is recomputed exactly from q/k
    (full row in VMEM — no logsumexp residual needed); dk/dv accumulate in
    their f32 VMEM output blocks across the loop."""
    dk_ref[0] = jnp.zeros_like(dk_ref[0])
    dv_ref[0] = jnp.zeros_like(dv_ref[0])

    k = k_ref[0].astype(jnp.float32)    # (Npad, D)
    v = v_ref[0].astype(jnp.float32)    # (Npad, D)
    kpad = k.shape[0]
    nq = q_ref.shape[1] // block_q

    def body(j, _):
        sl = pl.ds(j * block_q, block_q)
        q = q_ref[0, sl].astype(jnp.float32)    # (BQ, D)
        do = do_ref[0, sl].astype(jnp.float32)  # (BQ, D)

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BQ, Npad)
        # masked softmax (see _softmax_masked): padded columns carry p = 0
        # exactly, so ds/dv/dk see no contribution from padded rows of any
        # content and the gradients of the valid region are exact.
        e, denom = _softmax_masked(logits, kpad, n_valid)
        p = e / denom

        # dv += p^T @ do
        dv_ref[0] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # dp = do @ v^T; ds = p * (dp - rowsum(dp * p))
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq_ref[0, sl] = (jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale).astype(dq_ref.dtype)
        dk_ref[0] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        return 0

    jax.lax.fori_loop(0, nq, body, 0)


@functools.partial(jax.jit, static_argnames=("n_valid", "block_q"))
def _fused_attention_bwd_impl(q, k, v, do, n_valid=None, block_q: int = BLOCK_Q):
    b, h, n, d = q.shape
    if n_valid is None:
        n_valid = n
    scale = 1.0 / (d**0.5)
    npad = -(-n // block_q) * block_q
    kpad = -(-n // 128) * 128

    def prep(x, target):
        x = x.reshape(b * h, n, d)
        if target != n:
            x = jnp.pad(x, ((0, 0), (0, target - n), (0, 0)))
        return x

    qp, dop = prep(q, npad), prep(do, npad)
    kp, vp = prep(k, kpad), prep(v, kpad)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, n_valid, scale, block_q),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, npad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kpad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kpad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, npad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kpad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kpad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, npad, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, kpad, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, kpad, d), jnp.float32),
        ],
    )(qp, kp, vp, dop)
    dq = dq[:, :n].reshape(b, h, n, d)
    dk = dk[:, :n].reshape(b, h, n, d).astype(k.dtype)
    dv = dv[:, :n].reshape(b, h, n, d).astype(v.dtype)
    return dq, dk, dv


def fused_attention(q, k, v, n_valid: int | None = None):
    """q, k, v: (B, H, N, D) -> (B, H, N, D); softmax in f32 on-chip.

    ``n_valid`` masks keys at index >= n_valid out of the softmax (for
    sequences kept padded between ViT blocks); rows >= n_valid are
    don't-care. Differentiable: the backward is a Pallas recompute kernel
    with the same VMEM-resident-logits structure as the forward — the
    (B, H, N, N) f32 probability/ds tensors never touch HBM in either
    direction. (The einsum reference semantics live in ops/attention.py's
    sdpa fallback.)
    """
    n = q.shape[2]
    return _fused_attention_p(q, k, v, n if n_valid is None else int(n_valid))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_attention_p(q, k, v, n_valid):
    return _fused_attention_fwd_impl(q, k, v, n_valid)


def _fused_attention_fwd(q, k, v, n_valid):
    return _fused_attention_fwd_impl(q, k, v, n_valid), (q, k, v)


def _fused_attention_bwd(n_valid, res, do):
    # fused_attention's forward only runs where pallas_call works (real TPU
    # or forced interpret mode), so the backward kernel can run there too.
    q, k, v = res
    return _fused_attention_bwd_impl(q, k, v, do, n_valid)


_fused_attention_p.defvjp(_fused_attention_fwd, _fused_attention_bwd)


@functools.partial(jax.jit, static_argnames=("n_valid", "block_q"))
def _fused_attention_fwd_impl(q, k, v, n_valid=None, block_q: int = BLOCK_Q):
    b, h, n, d = q.shape
    if n_valid is None:
        n_valid = n
    scale = 1.0 / (d**0.5)
    npad = -(-n // block_q) * block_q
    kpad = -(-n // 128) * 128

    def prep(x, target):
        x = x.reshape(b * h, n, d)
        if target != n:
            x = jnp.pad(x, ((0, 0), (0, target - n), (0, 0)))
        return x

    qp = prep(q, npad)
    kp = prep(k, kpad)
    vp = prep(v, kpad)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, n_valid, scale, block_q),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, npad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kpad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kpad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, npad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, npad, d), q.dtype),
    )(qp, kp, vp)
    return out[:, :n].reshape(b, h, n, d)


# ---------------------------------------------------------------------------
# packed-layout attention: read the qkv Dense output directly
# ---------------------------------------------------------------------------
#
# The (B, N, 3, H, D) -> (3, B, H, N, D) transpose around the per-head
# kernel costs two HBM passes of the 3C-wide qkv tensor (~1.4 ms per ViT-L
# block at the RoMa coarse shape, measured tools/profile_dinov2.py), and
# the output transpose back costs another. This variant takes the qkv
# Dense output (B, N, 3C) AS IS — [q | k | v] segments, each head-major —
# and serves each grid step a 128-lane slice of it via BlockSpec index
# maps (128 = one lane tile, so any d in {64, 128} stays aligned: d=64
# processes a PAIR of heads per step, d=128 a single head). The output is
# written token-major (B, N, C), exactly the layout the proj Dense wants,
# so neither transpose exists in the packed path.


def _attn_packed_kernel(
    n_valid: int, scale: float, block_q: int, d: int,
    qq_ref, kk_ref, vv_ref, o_ref,
):
    """One batch x head-group per grid step; 128 lanes = 128//d heads."""
    kpad = kk_ref.shape[1]
    nq = qq_ref.shape[1] // block_q
    kk = kk_ref[0].astype(jnp.float32)   # (Npad, 128)
    vv = vv_ref[0]                       # (Npad, 128)

    def body(j, _):
        sl = pl.ds(j * block_q, block_q)
        qf = qq_ref[0, sl].astype(jnp.float32)  # (BQ, 128)
        outs = []
        for h2 in range(128 // d):
            q = qf[:, h2 * d:(h2 + 1) * d]
            k = kk[:, h2 * d:(h2 + 1) * d]
            v = vv[:, h2 * d:(h2 + 1) * d]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (BQ, Npad)
            e, denom = _softmax_masked(logits, kpad, n_valid)
            pv = jax.lax.dot_general(
                e.astype(vv.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append(pv / denom)
        o = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
        o_ref[0, sl] = o.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nq, body, 0)


def _packed_block_q(npad: int) -> int:
    for bq in (512, 384, 256, 128):
        if npad % bq == 0:
            return bq
    return 128


@functools.partial(jax.jit, static_argnames=("num_heads", "n_valid"))
def _fused_attention_packed_fwd_impl(qkv, num_heads, n_valid):
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    scale = 1.0 / (d**0.5)
    npad = -(-n // 128) * 128
    if npad != n:
        qkv = jnp.pad(qkv, ((0, 0), (0, npad - n), (0, 0)))
    block_q = _packed_block_q(npad)
    lanes_c = c // 128  # 128-lane groups per segment

    out = pl.pallas_call(
        functools.partial(_attn_packed_kernel, n_valid, scale, block_q, d),
        grid=(b, lanes_c),
        in_specs=[
            pl.BlockSpec((1, npad, 128), lambda i, g: (i, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, 128), lambda i, g, _lc=lanes_c: (i, 0, _lc + g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, 128), lambda i, g, _lc=lanes_c: (i, 0, 2 * _lc + g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, npad, 128), lambda i, g: (i, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, npad, c), qkv.dtype),
    )(qkv, qkv, qkv)
    return out[:, :n]


def _packed_supported(num_heads: int, c: int) -> bool:
    """Layout precondition for the packed kernel (the routing gate used by
    ops/attention.py:attention_packed). The last conjunct rejects the
    truncating case c // num_heads in {64, 128} with c % num_heads != 0,
    where the segment slicing would be wrong."""
    d = c // num_heads
    return d in (64, 128) and c % 128 == 0 and d * num_heads == c


def fused_attention_packed(qkv, num_heads: int, n_valid: int | None = None):
    """qkv: (B, N, 3C) straight from the qkv Dense ([q|k|v], head-major
    segments) -> (B, N, C) token-major attention output (proj-ready).

    Requires head_dim in {64, 128}. Differentiable: backward unpacks to the
    per-head layout and reuses the recompute backward kernel — the packed
    layout is a pure inference/throughput optimization, training pays the
    transposes it would have paid anyway.
    """
    n = qkv.shape[1]
    return _fused_attention_packed_p(
        qkv, num_heads, n if n_valid is None else int(n_valid)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _fused_attention_packed_p(qkv, num_heads, n_valid):
    return _fused_attention_packed_fwd_impl(qkv, num_heads, n_valid)


def _fused_attention_packed_fwd(qkv, num_heads, n_valid):
    return _fused_attention_packed_fwd_impl(qkv, num_heads, n_valid), (qkv,)


def _fused_attention_packed_bwd(num_heads, n_valid, res, do):
    (qkv,) = res
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    q, k, v = (
        qkv[:, :, i * c:(i + 1) * c]
        .reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)
        for i in range(3)
    )
    doh = do.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)
    dq, dk, dv = _fused_attention_bwd_impl(q, k, v, doh, n_valid)
    dqkv = jnp.concatenate(
        [g.transpose(0, 2, 1, 3).reshape(b, n, c) for g in (dq, dk, dv)], axis=-1
    )
    return (dqkv.astype(qkv.dtype),)


_fused_attention_packed_p.defvjp(
    _fused_attention_packed_fwd, _fused_attention_packed_bwd
)
