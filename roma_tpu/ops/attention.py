"""Scaled-dot-product attention for the ViT paths.

Replaces the reference's torch SDPA / xformers memory_efficient_attention
(romatch/models/transformer/layers/attention.py:50-96). Plain einsum
attention with an optional query-block scan that bounds the logits transient
(the XLA analogue of memory-efficient attention) — at RoMa's sequence lengths
(~1.6k-3.8k tokens) full flash kernels are unnecessary, but the B*H*N^2
logits at batch 16 are worth chunking.

Softmax runs in float32; matmuls use the inputs' dtype on the MXU with f32
accumulation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_chunk: int | None = None,
    use_pallas: bool | None = None,
    n_valid: int | None = None,
) -> jnp.ndarray:
    """q, k, v: (B, H, N, D) -> (B, H, N, D).

    ``n_valid``: number of real tokens when the sequence is padded (the ViT
    stacks keep tokens padded to a lane multiple between blocks); keys at
    index >= n_valid are masked out of the softmax, and rows >= n_valid are
    don't-care. On TPU, dispatches to the Pallas fused kernel
    (ops/pallas_attention.py) that keeps the logits in VMEM; the einsum
    path is the CPU/testing fallback and the reference semantics.
    """
    b, h, n, d = q.shape
    if use_pallas is None:
        use_pallas = _on_tpu() and d % 64 == 0
    if use_pallas:
        from .pallas_attention import fused_attention

        return fused_attention(q, k, v, n_valid=n_valid)
    scale = 1.0 / jnp.sqrt(jnp.float32(d))

    def attend(qb):
        logits = (
            jnp.einsum("bhqd,bhkd->bhqk", qb, k, preferred_element_type=jnp.float32)
            * scale
        )
        if n_valid is not None and n_valid < n:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 3)
            logits = jnp.where(col < n_valid, logits, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)

    if q_chunk is None or n <= q_chunk:
        return attend(q)

    pad = (-n) % q_chunk
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    # scan over query blocks: (nblocks, B, H, q_chunk, D)
    blocks = qp.reshape(b, h, -1, q_chunk, d).transpose(2, 0, 1, 3, 4)
    out = jax.lax.map(attend, blocks)  # (nblocks, B, H, q_chunk, D)
    out = out.transpose(1, 2, 0, 3, 4).reshape(b, h, -1, d)
    return out[:, :, :n]


def attention_packed(qkv: jnp.ndarray, num_heads: int, n_valid: int | None = None):
    """Attention straight from the qkv Dense output.

    qkv: (B, N, 3C) laid out [q | k | v] with head-major segments (the
    natural ``Dense(3C)`` output). Returns (B, N, C) token-major — the
    layout the proj Dense consumes. On TPU this runs the packed Pallas
    kernel (ops/pallas_attention.py), which never materializes the
    (3, B, H, N, D) transpose or the output head-merge transpose (~2.8 ms
    of HBM passes per ViT-L block at the RoMa coarse shape); elsewhere it
    unpacks and falls back to the einsum ``sdpa``.
    """
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    from .pallas_attention import _packed_supported, fused_attention_packed

    if _on_tpu() and _packed_supported(num_heads, c):
        return fused_attention_packed(qkv, num_heads, n_valid=n_valid)
    q, k, v = (
        qkv[:, :, i * c:(i + 1) * c].reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)
        for i in range(3)
    )
    out = sdpa(q, k, v, n_valid=n_valid)
    return out.transpose(0, 2, 1, 3).reshape(b, n, c)
