"""Dynamic int8 matmul for the frozen-encoder serving path.

v5e's MXU runs int8 x int8 -> int32 at twice the bf16 rate, and the frozen
DINOv2 ViT-L is the single largest compute bucket of the coarse pass
(~15.5 TFLOP, near the bf16 roofline). This implements the standard
near-lossless recipe — symmetric per-token activation scales, symmetric
per-output-channel weight scales, f32 dequant — as a drop-in for the ViT's
Dense layers (reference layers: attention.py qkv/proj, mlp.py fc1/fc2).

Weights are quantized on the fly from the f32 params each call: the
round/scale is O(K*N) elementwise next to an O(M*K*N) matmul (M ~ 26k
tokens at the RoMa coarse shape), and keeping the param tree identical to
the bf16 path means the torch->flax converter and every checkpoint path
stay unchanged.

Opt-in (RoMaConfig.vit_int8 / roma_outdoor(vit_int8=True)): int8 changes
numerics; the released-weight accuracy deltas must be validated on the
golden metrics before it is defaulted anywhere.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def int8_matmul(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    out_dtype=None,
) -> jnp.ndarray:
    """``x @ kernel + bias`` via dynamically-quantized int8.

    x: (..., K) activations (any float dtype); kernel: (K, N) float params;
    returns (..., N) in ``out_dtype`` (default: x.dtype).

    Scales: per-token (row) symmetric for x, per-output-channel symmetric
    for the kernel; accumulation int32, dequant in f32.
    """
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) / 127.0
    xq = jnp.round(xf / sx).astype(jnp.int8)

    kf = kernel.astype(jnp.float32)
    sk = jnp.maximum(jnp.max(jnp.abs(kf), axis=0, keepdims=True), 1e-12) / 127.0
    kq = jnp.round(kf / sk).astype(jnp.int8)

    acc = jax.lax.dot_general(
        xq, kq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * sx * sk
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype or x.dtype)
