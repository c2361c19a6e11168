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
from .config import RoMaConfig
from .vit import DinoV2

Dtype = Any

# torchvision vgg19_bn configuration "E" layer indices of the convs in
# features[:40], grouped per pyramid stage ("M" = MaxPool boundary); channel
# counts come from RoMaConfig.vgg_channels.
VGG19_STAGE_IDX = ((0, 3), (7, 10), (14, 17, 20, 23), (27, 30, 33, 36))

# Full-size plan in (torchvision conv index, out_channels) / "M" form, used by
# the weight converter (zoo/convert.py) and parity tests.
VGG19_PLAN = [
    entry
    for idxs, chans in zip(VGG19_STAGE_IDX, RoMaConfig().vgg_channels)
    for entry in [*zip(idxs, chans), "M"]
]


class VGG19(nn.Module):
    """VGG19-BN feature pyramid (reference encoders.py:6-27).

    Conv/BN modules are named by their torchvision ``features`` index so the
    weight converter is a mechanical rename (conv{i} / bn{i+1}).
    """

    channels: tuple[tuple[int, ...], ...] = RoMaConfig().vgg_channels
    dtype: Dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> dict[int, jnp.ndarray]:
        feats: dict[int, jnp.ndarray] = {}
        scale = 1
        for idxs, chans in zip(VGG19_STAGE_IDX, self.channels):
            for idx, ch in zip(idxs, chans):
                x = torch_conv(ch, kernel=3, padding=1, dtype=self.dtype, name=f"conv{idx}")(x)
                x = torch_bn(affine=True, train=self.train, dtype=self.dtype, name=f"bn{idx + 1}")(x)
                x = nn.relu(x)
            feats[scale] = x
            scale *= 2
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class CNNandDinov2(nn.Module):
    """VGG pyramid + frozen DINOv2 stride-14 tokens under key 16
    (reference encoders.py:29-68)."""

    config: RoMaConfig = RoMaConfig()
    dtype: Dtype = jnp.float32
    coarse_dtype: Dtype = jnp.float32  # reference runs DINOv2 in fp16 (amp_dtype)
    train: bool = False
    remat: bool = False  # jax.checkpoint the VGG pyramid (training memory)

    @nn.compact
    def __call__(self, x: jnp.ndarray, upsample: bool = False):
        cfg = self.config
        # nn.remat on the class keeps the "vgg" name scope (converter
        # mapping unchanged); under grad the pyramid activations are
        # recomputed in backward instead of living until the end of the
        # step. DINOv2 needs no checkpointing: it is stop_gradient-frozen,
        # so AD never stores its intermediates.
        vgg_cls = nn.remat(VGG19) if self.remat else VGG19
        pyramid = vgg_cls(
            channels=cfg.vgg_channels, dtype=self.dtype, train=self.train, name="vgg"
        )(x)
        if not upsample:
            dinov2 = DinoV2(
                embed_dim=cfg.dino_dim,
                depth=cfg.dino_depth,
                num_heads=cfg.dino_heads,
                patch_size=cfg.dino_patch,
                dtype=self.coarse_dtype,
                int8=cfg.vit_int8,
                gelu_approx=cfg.vit_gelu_tanh,
                name="dinov2",
            )
            feats16 = dinov2(x.astype(self.coarse_dtype))
            pyramid[16] = jax.lax.stop_gradient(feats16)  # frozen (dinov2.py:154-155)
        return pyramid
