"""Shared conv building blocks (Flax linen, NHWC, TPU layouts).

Torch parity notes (these mirror reference semantics, not reference code):
  * torch ``nn.Conv2d(k, stride, padding)`` pads symmetrically; we always pass
    explicit ``((p, p), (p, p))`` padding so strided shapes match torch's
    ``floor((H + 2p - k)/s) + 1`` exactly.
  * ``BasicLayer`` = Conv(bias=False) -> BatchNorm(affine=False) -> ReLU is the
    unit of both the XFeat backbone and the tiny matcher CNNs (reference
    romatch/models/tiny.py:15-28).
  * Weights are stored f32; compute dtype is configurable (bf16 on TPU).

Param tree layout: each BasicLayer owns {"conv": nn.Conv, "bn": nn.BatchNorm}
so torch state-dict conversion is a flat rename (see models/zoo/convert.py).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def torch_conv(
    features: int,
    kernel: int = 3,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    use_bias: bool = True,
    groups: int = 1,
    dtype: Dtype = jnp.float32,
    name: str = "conv",
) -> nn.Conv:
    """nn.Conv configured with torch Conv2d shape semantics."""
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        kernel_dilation=(dilation, dilation),
        use_bias=use_bias,
        feature_group_count=groups,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class QConv1x1(nn.Module):
    """1x1 conv computed via dynamic int8 (ops/int8.py): the (B,H,W,Cin)
    map contracts against the (Cin,Cout) kernel on the int8 MXU with
    per-pixel activation scales. Param tree identical to
    ``nn.Conv(features, (1,1))`` (kernel (1,1,Cin,Cout) f32 + bias), so
    checkpoints and converters are oblivious to which one built a model."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.int8 import int8_matmul

        ci = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, ci, self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return int8_matmul(
            x, kernel.reshape(ci, self.features), bias, out_dtype=self.dtype
        )


def torch_bn(
    affine: bool = True,
    train: bool = False,
    dtype: Dtype = jnp.float32,
    name: str = "bn",
) -> nn.BatchNorm:
    """nn.BatchNorm with torch BatchNorm2d defaults (eps=1e-5, momentum 0.1)."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        use_bias=affine,
        use_scale=affine,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class BasicLayer(nn.Module):
    """Conv(bias=False) -> BN(affine=False) -> ReLU (reference tiny.py:15-28)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    use_bias: bool = False
    relu: bool = True
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = torch_conv(
            self.features,
            kernel=self.kernel,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        x = torch_bn(affine=False, train=self.train, dtype=self.dtype)(x)
        if self.relu:
            x = nn.relu(x)
        return x


class ConvStack(nn.Module):
    """BasicLayers (named layer{i}) + optional plain conv head (named head)."""

    specs: Sequence[dict]
    head_features: int | None = None
    head_kernel: int = 1
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, spec in enumerate(self.specs):
            x = BasicLayer(train=self.train, dtype=self.dtype, name=f"layer{i}", **spec)(x)
        if self.head_features is not None:
            pad = 0 if self.head_kernel == 1 else self.head_kernel // 2
            x = torch_conv(
                self.head_features,
                kernel=self.head_kernel,
                padding=pad,
                use_bias=True,
                dtype=self.dtype,
                name="head",
            )(x)
        return x


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=False) over NHWC spatial dims, torch semantics."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    return ((x32 - mean) * jnp.reciprocal(jnp.sqrt(var + eps))).astype(x.dtype)
