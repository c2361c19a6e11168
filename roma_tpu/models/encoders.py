"""Feature encoders for big RoMa: VGG19-BN fine pyramid + frozen DINOv2
coarse tokens.

Re-design of reference romatch/models/encoders.py:
  * ``VGG19``: torchvision vgg19_bn ``features[:40]`` walked with a snapshot
    before every MaxPool -> stride-keyed pyramid {1: 64ch, 2: 128ch, 4: 256ch,
    8: 512ch} (encoders.py:6-27).
  * ``CNNandDinov2``: adds the frozen DINOv2 ViT-L/14 patch-token map under
    pyramid key 16 (actual stride 14 — the dual 14-vs-16 keying of the
    reference, encoders.py:60-67); skipped when ``upsample=True``.

The pyramid is a dict {int stride: (B, H/s, W/s, C)} NHWC.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import torch_bn, torch_conv
from .vit import DinoV2

Dtype = Any

# torchvision vgg19_bn configuration "E" conv plan for features[:40]:
# (torchvision layer index of the conv, out_channels); "M" = MaxPool boundary.
VGG19_PLAN = [
    (0, 64), (3, 64), "M",
    (7, 128), (10, 128), "M",
    (14, 256), (17, 256), (20, 256), (23, 256), "M",
    (27, 512), (30, 512), (33, 512), (36, 512), "M",
]


class VGG19(nn.Module):
    """VGG19-BN feature pyramid (reference encoders.py:6-27).

    Conv/BN modules are named by their torchvision ``features`` index so the
    weight converter is a mechanical rename (conv{i} / bn{i+1}).
    """

    dtype: Dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> dict[int, jnp.ndarray]:
        feats: dict[int, jnp.ndarray] = {}
        scale = 1
        for item in VGG19_PLAN:
            if item == "M":
                feats[scale] = x
                scale *= 2
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            idx, ch = item
            x = torch_conv(ch, kernel=3, padding=1, dtype=self.dtype, name=f"conv{idx}")(x)
            x = torch_bn(affine=True, train=self.train, dtype=self.dtype, name=f"bn{idx + 1}")(x)
            x = nn.relu(x)
        return feats


class CNNandDinov2(nn.Module):
    """VGG pyramid + frozen DINOv2 stride-14 tokens under key 16
    (reference encoders.py:29-68)."""

    dtype: Dtype = jnp.float32
    coarse_dtype: Dtype = jnp.float32  # reference runs DINOv2 in fp16 (amp_dtype)
    train: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, upsample: bool = False):
        pyramid = VGG19(dtype=self.dtype, train=self.train, name="vgg")(x)
        if not upsample:
            dinov2 = DinoV2(dtype=self.coarse_dtype, name="dinov2")
            feats16 = dinov2(x.astype(self.coarse_dtype))
            pyramid[16] = jax.lax.stop_gradient(feats16)  # frozen (dinov2.py:154-155)
        return pyramid
