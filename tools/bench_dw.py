"""Depthwise-conv formulation microbench at the wide-C refiner shapes.

The ConvRefiner hidden blocks (reference romatch/models/matcher.py:92-122)
are dw5x5 -> BN -> ReLU -> 1x1. The wide-C stacks (C=144..1377) run XLA
grouped ``nn.Conv`` for the depthwise stage; on TPU a depthwise conv cannot
use the MXU, and XLA's grouped-conv lowering may lose to a plain 25-tap
shift-and-FMA formulation that fuses into the surrounding elementwise ops.

This tool times, per refiner shape (v5e silicon):
  a. grouped-conv dw5x5 + bias        (the current model path)
  b. shift-and-FMA dw5x5 + bias       (jnp.pad + 25 sliced FMAs)
  c. 1x1 matmul alone                 (the MXU part, for the split)
  d. full block a-form vs b-form      (dw + BN-affine + relu + 1x1)

Run: python tools/bench_dw.py  (needs the TPU tunnel; ~2 min)
"""
from __future__ import annotations

import functools
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np

# (tag, B, H, C) — decoder batch 16 (8 pairs, symmetric), square maps
SHAPES = [
    ("s16-c  35^2 C=1377", 16, 35, 1377),
    ("s8-c   70^2 C=1137", 16, 70, 1137),
    ("s4-c  140^2 C=569", 16, 140, 569),
    ("s2-c  280^2 C=144", 16, 280, 144),
    ("s8-up 108^2 C=1137", 16, 108, 1137),
    ("s4-up 216^2 C=569", 16, 216, 569),
    ("s2-up 432^2 C=144", 16, 432, 144),
]


def dw_grouped(x, k, b):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    ) + b


def dw_fma(x, k, b):
    h, w = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    acc = None
    for u in range(5):
        for v in range(5):
            t = xp[:, u : u + h, v : v + w, :] * k[u, v, 0]
            acc = t if acc is None else acc + t
    return acc + b


def pw(x, w2, b2):
    return (
        jnp.einsum("bhwc,cd->bhwd", x, w2, preferred_element_type=jnp.float32)
        .astype(x.dtype)
        + b2
    )


def block(x, k, b, s, t, w2, b2, dw):
    y = jnp.maximum(dw(x, k, b) * s + t, 0.0).astype(x.dtype)
    return pw(y, w2, b2)


def timeit(fn, *args, iters=20):
    # block_until_ready does not barrier through the axon tunnel; a scalar
    # readback does (same pattern as tools/tpu_session.py int8 probe)
    float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jnp.sum(r))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rs = np.random.RandomState(0)
    dt = jnp.bfloat16
    for tag, bsz, hw, c in SHAPES:
        x = jnp.asarray(rs.randn(bsz, hw, hw, c), dt)
        k = jnp.asarray(rs.randn(5, 5, 1, c), dt)
        b = jnp.asarray(rs.randn(c), dt)
        s = jnp.asarray(rs.rand(c) + 0.5, dt)
        t = jnp.asarray(rs.randn(c), dt)
        w2 = jnp.asarray(rs.randn(c, c) / np.sqrt(c), dt)
        b2 = jnp.asarray(rs.randn(c), dt)

        f_g = jax.jit(functools.partial(dw_grouped))
        f_f = jax.jit(functools.partial(dw_fma))
        f_p = jax.jit(pw)
        blk_g = jax.jit(functools.partial(block, dw=dw_grouped))
        blk_f = jax.jit(functools.partial(block, dw=dw_fma))

        tg = timeit(f_g, x, k, b)
        tf = timeit(f_f, x, k, b)
        tp = timeit(f_p, x, w2, b2)
        tbg = timeit(blk_g, x, k, b, s, t, w2, b2)
        tbf = timeit(blk_f, x, k, b, s, t, w2, b2)
        flops = bsz * hw * hw * c * c * 2
        print(
            f"  {tag}: dw grouped {tg:6.2f} | dw fma {tf:6.2f} | "
            f"1x1 {tp:6.2f} ({flops/tp/1e9:5.1f} T) | "
            f"block grouped {tbg:6.2f} | block fma {tbf:6.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
