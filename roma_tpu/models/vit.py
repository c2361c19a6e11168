"""ViT building blocks + DINOv2 vision transformer (Flax, NHWC tokens).

TPU-native re-design of the reference's vendored DINOv2
(romatch/models/transformer/dinov2.py:43-359, layers/*.py):
  * pre-norm Block with optional LayerScale (init_values=1.0 for DINOv2),
  * SDPA attention via ops.sdpa (the XLA replacement for torch SDPA /
    xformers memory_efficient_attention, layers/attention.py:50-96),
  * bicubic pos-embed interpolation for arbitrary resolution with torch
    ``scale_factor`` semantics (dinov2.py:166-190) via ops.interpolate,
  * frozen in the RoMa pipeline: the caller wraps with stop_gradient.

Token layout (B, N, D); param layout matches torch Linear transposed at
conversion time (models/zoo/convert.py).
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import attention_packed, interpolate
from ..ops.int8 import int8_matmul

Dtype = Any


class QDense(nn.Module):
    """Drop-in for ``nn.Dense`` computing through dynamic int8
    (ops/int8.py). The param tree (kernel/bias names, shapes, f32 dtype,
    initializers) is identical to nn.Dense, so checkpoints and the torch
    converter are oblivious to which one a model was built with."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return int8_matmul(x, kernel, bias, out_dtype=self.dtype)


def _dense(int8: bool, features: int, *, use_bias: bool = True, dtype, name: str):
    cls = QDense if int8 else nn.Dense
    kw = {} if int8 else {"param_dtype": jnp.float32}
    return cls(features, use_bias=use_bias, dtype=dtype, name=name, **kw)


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Dtype = jnp.float32
    int8: bool = False
    gelu_approx: bool = False  # serving knob: tanh GELU (see RoMaConfig)

    @nn.compact
    def __call__(self, x):
        x = _dense(self.int8, self.hidden, dtype=self.dtype, name="fc1")(x)
        # torch nn.GELU default = exact erf (reference layers/mlp.py:21)
        x = nn.gelu(x, approximate=self.gelu_approx)
        x = _dense(self.int8, self.out, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    proj_bias: bool = True
    dtype: Dtype = jnp.float32
    n_valid: int | None = None  # real tokens when the sequence is lane-padded
    int8: bool = False

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        # qkv stays bf16 even under int8: the (K=1024, N=3072) int8 dot is
        # MEASURED slower than bf16 on v5e (61 vs 100 TFLOP/s at the RoMa
        # token count; tools/tpu_session.py int8-matmul-probe) — 3C=3072
        # tiles poorly for the int8 MXU path, while 1024/4096-wide outputs
        # win 1.24-1.9x. proj/fc1/fc2 quantize, qkv does not.
        qkv = _dense(
            False, 3 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv"
        )(x)
        # packed path: the kernel reads the Dense output layout directly
        # and writes token-major, so the (3, B, H, N, D) transpose and the
        # head-merge transpose (two HBM passes of the 3C-wide tensor per
        # block) never exist. attention_packed falls back to the einsum
        # sdpa off-TPU / at unsupported head dims.
        out = attention_packed(qkv, self.num_heads, n_valid=self.n_valid)
        return _dense(
            self.int8, c, use_bias=self.proj_bias, dtype=self.dtype, name="proj"
        )(out)


class LayerScale(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,), jnp.float32)
        return x * gamma.astype(x.dtype)


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample
    (reference layers/drop_path.py:15-32).

    The reference's training-time batch-subset trick (block.py:110-131
    runs the branch on a random subset and index_add's it back) is a
    dynamic-shape optimization that XLA cannot express; the TPU version
    keeps static shapes and masks — same distribution, same scaling.
    """

    rate: float = 0.0
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        if self.deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(
            self.make_rng("dropout"), keep, (x.shape[0],) + (1,) * (x.ndim - 1)
        )
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Block(nn.Module):
    """Pre-norm ViT block (reference layers/block.py:36-108, eval path)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layer_scale: bool = False
    qkv_bias: bool = True
    drop_path: float = 0.0  # stochastic depth; 0 on every RoMa path
    deterministic: bool = True
    dtype: Dtype = jnp.float32
    n_valid: int | None = None
    int8: bool = False
    gelu_approx: bool = False

    @nn.compact
    def __call__(self, x):
        ln = lambda name: nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        dp = DropPath(rate=self.drop_path, deterministic=self.deterministic)
        attn_out = Attention(
            self.dim, self.num_heads, qkv_bias=self.qkv_bias, dtype=self.dtype,
            n_valid=self.n_valid, int8=self.int8, name="attn"
        )(ln("norm1")(x))
        if self.layer_scale:
            attn_out = LayerScale(self.dim, name="ls1")(attn_out)
        x = x + dp(attn_out)
        mlp_out = Mlp(
            int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
            int8=self.int8, gelu_approx=self.gelu_approx, name="mlp"
        )(ln("norm2")(x))
        if self.layer_scale:
            mlp_out = LayerScale(self.dim, name="ls2")(mlp_out)
        return x + dp(mlp_out)


class ScannedBlocks(nn.Module):
    """Depth-stacked identical ViT blocks via nn.scan: ONE block is traced and
    compiled, weights carry a leading depth axis. This is the TPU-idiomatic
    layer stack — it cuts XLA compile time ~depth-fold vs an unrolled loop
    and enables per-block rematerialization."""

    depth: int
    dim: int
    num_heads: int
    layer_scale: bool = True
    qkv_bias: bool = True
    remat: bool = True
    unroll: int = 1  # scan unroll factor (layout experiment knob)
    dtype: Dtype = jnp.float32
    n_valid: int | None = None
    int8: bool = False
    gelu_approx: bool = False

    @nn.compact
    def __call__(self, tokens):
        block_cls = nn.remat(Block) if self.remat else Block

        def body(mdl, carry, _):
            out = block_cls(
                dim=self.dim,
                num_heads=self.num_heads,
                layer_scale=self.layer_scale,
                qkv_bias=self.qkv_bias,
                dtype=self.dtype,
                n_valid=self.n_valid,
                int8=self.int8,
                gelu_approx=self.gelu_approx,
                name="block",
            )(carry)
            return out, None

        scan = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.depth,
            unroll=self.unroll,
        )
        tokens, _ = scan(self, tokens, None)
        return tokens


class DinoV2(nn.Module):
    """DINOv2 vision transformer, forward_features path only.

    Returns the normalized patch tokens reshaped to an NHWC stride-14 map —
    the only output the RoMa encoder consumes (reference encoders.py:60-67).
    """

    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_size: int = 14
    pretrain_img_size: int = 518
    dtype: Dtype = jnp.float32
    int8: bool = False  # run the block Dense layers via dynamic int8
    gelu_approx: bool = False  # tanh GELU in the MLPs (serving knob)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, 3), H/W % 14 == 0 -> (B, H/14, W/14, embed_dim)."""
        b, h, w, _ = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p

        tokens = nn.Conv(
            self.embed_dim,
            (p, p),
            strides=(p, p),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="patch_embed",
        )(x).reshape(b, gh * gw, self.embed_dim)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim), jnp.float32
        )
        n_pretrain = (self.pretrain_img_size // p) ** 2
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, n_pretrain + 1, self.embed_dim),
            jnp.float32,
        )
        pos = self._interpolate_pos_encoding(pos_embed, gh, gw)
        tokens = jnp.concatenate(
            (jnp.broadcast_to(cls_token.astype(tokens.dtype), (b, 1, self.embed_dim)), tokens),
            axis=1,
        )
        tokens = tokens + pos.astype(tokens.dtype)

        # keep the sequence padded to a lane multiple through the stack:
        # the odd token count (gh*gw + 1) otherwise costs ~30% on every
        # qkv/mlp matmul (measured v5e, N=1601 vs 1664); padded keys are
        # masked out of the attention softmax via n_valid.
        ntok = gh * gw + 1
        npad = -(-ntok // 128) * 128
        if npad != ntok:
            tokens = jnp.pad(tokens, ((0, 0), (0, npad - ntok), (0, 0)))
        tokens = ScannedBlocks(
            depth=self.depth,
            dim=self.embed_dim,
            num_heads=self.num_heads,
            layer_scale=True,
            dtype=self.dtype,
            n_valid=ntok if npad != ntok else None,
            int8=self.int8,
            gelu_approx=self.gelu_approx,
            name="blocks",
        )(tokens)
        tokens = nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name="norm"
        )(tokens)
        return tokens[:, 1:ntok].reshape(b, gh, gw, self.embed_dim)

    def _interpolate_pos_encoding(self, pos_embed, gh: int, gw: int):
        """Bicubic resize of the pretraining pos-embed grid to (gh, gw),
        reproducing torch's scale_factor + 0.1 trick (dinov2.py:166-190)."""
        n = pos_embed.shape[1] - 1
        side = int(math.sqrt(n))
        if gh * gw == n and gh == gw:
            return pos_embed
        cls_pos = pos_embed[:, :1]
        patch_pos = pos_embed[:, 1:].reshape(1, side, side, self.embed_dim)
        patch_pos = interpolate(
            patch_pos,
            (gh, gw),
            mode="bicubic",
            scale_factor=((gh + 0.1) / side, (gw + 0.1) / side),
        )
        return jnp.concatenate(
            (cls_pos, patch_pos.reshape(1, gh * gw, self.embed_dim)), axis=1
        )


def vit_large(dtype: Dtype = jnp.float32) -> DinoV2:
    """DINOv2 ViT-L/14 preset (reference dinov2.py:333-345)."""
    return DinoV2(embed_dim=1024, depth=24, num_heads=16, dtype=dtype, name=None)
