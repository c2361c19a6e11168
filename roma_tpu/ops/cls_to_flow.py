"""Coarse-match classification -> continuous flow conversion.

Reference semantics: romatch/utils/utils.py:300-322 (``cls_to_flow_refine``)
— softmax over the res^2 anchor classes, take the argmax cell plus its 4
neighbours (x±1, y±res in flattened index space, clamped), and average their
anchor coordinates weighted by probability.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .coords import normalized_grid


def cls_to_flow_refine(cls_logits: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) anchor logits -> (B, H, W, 2) flow in [-1, 1].

    C must be a perfect square (res^2); anchors are the normalized pixel-center
    grid of a res x res image, flattened y-major and stacked (x, y) — matching
    torch meshgrid 'ij' over (y, x).
    """
    b, h, w, c = cls_logits.shape
    res = round(math.sqrt(c))
    assert res * res == c, f"anchor count {c} is not a square"
    anchors = normalized_grid(res, res).reshape(c, 2)  # (C, 2), xy

    probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
    mode = jnp.argmax(probs, axis=-1)  # (B, H, W)
    index = jnp.stack(
        (mode - 1, mode, mode + 1, mode - res, mode + res), axis=-1
    ).clip(0, c - 1)  # (B, H, W, 5)
    neigh_p = jnp.take_along_axis(probs, index, axis=-1)  # (B, H, W, 5)
    neigh_xy = anchors[index]  # (B, H, W, 5, 2)
    flow = jnp.sum(neigh_p[..., None] * neigh_xy, axis=-2) / jnp.sum(
        neigh_p, axis=-1, keepdims=True
    )
    return flow
