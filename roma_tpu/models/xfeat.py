"""XFeat backbone (Flax, NHWC) — the Tiny RoMa feature extractor.

Re-implementation of the public XFeat encoder ("XFeat: Accelerated Features
for Lightweight Image Matching", CVPR 2024, hub `verlab/accelerated_features`)
as consumed by the reference Tiny RoMa (`romatch/models/tiny.py:81-99`):
grayscale-mean input -> instance norm -> block1..5 with a stride-4 skip,
returning the stride-4 24-channel fine map (x2) and the stride-8 64-channel
fused coarse map (block_fusion(x3 + up(x4) + up(x5))).

Heads (keypoint/heatmap/fine_matcher) are never constructed — the reference
deletes them (tiny.py:42).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops import interpolate
from .blocks import BasicLayer, instance_norm, torch_conv

Dtype = Any


class XFeatBackbone(nn.Module):
    dtype: Dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (B, H, W, C) image in [0,1], H,W divisible by 32.

        Returns (fine (B, H/4, W/4, 24), coarse (B, H/8, W/8, 64)).
        """
        kw = dict(train=self.train, dtype=self.dtype)
        x = jnp.mean(x, axis=-1, keepdims=True)
        x = instance_norm(x)

        def seq(name, specs, inp):
            h = inp
            for i, spec in enumerate(specs):
                h = BasicLayer(name=f"{name}_{i}", **spec, **kw)(h)
            return h

        x1 = seq(
            "block1",
            [
                dict(features=4, stride=1),
                dict(features=8, stride=2),
                dict(features=8, stride=1),
                dict(features=24, stride=2),
            ],
            x,
        )
        # skip1: AvgPool2d(4,4) -> Conv1x1(1->24, bias)
        skip = nn.avg_pool(x, (4, 4), strides=(4, 4))
        skip = torch_conv(24, kernel=1, padding=0, dtype=self.dtype, name="skip1")(skip)
        x2 = seq(
            "block2",
            [dict(features=24, stride=1), dict(features=24, stride=1)],
            x1 + skip,
        )
        x3 = seq(
            "block3",
            [
                dict(features=64, stride=2),
                dict(features=64, stride=1),
                dict(features=64, kernel=1, padding=0),
            ],
            x2,
        )
        x4 = seq(
            "block4",
            [
                dict(features=64, stride=2),
                dict(features=64, stride=1),
                dict(features=64, stride=1),
            ],
            x3,
        )
        x5 = seq(
            "block5",
            [
                dict(features=128, stride=2),
                dict(features=128, stride=1),
                dict(features=128, stride=1),
                dict(features=64, kernel=1, padding=0),
            ],
            x4,
        )
        h3, w3 = x3.shape[1], x3.shape[2]
        # reference upsamples with default (align_corners=False) bilinear
        x4 = interpolate(x4, (h3, w3), mode="bilinear")
        x5 = interpolate(x5, (h3, w3), mode="bilinear")
        feats = seq(
            "block_fusion",
            [dict(features=64, stride=1), dict(features=64, stride=1)],
            x3 + x4 + x5,
        )
        feats = torch_conv(
            64, kernel=1, padding=0, dtype=self.dtype, name="block_fusion_head"
        )(feats)
        return x2, feats
