"""Inference-routed per-line costs at the golden 672->1344 config (bs4
symmetric -> decoder batch 8), to aim the last perf push. Unlike
profile_breakdown.py, every op here is called exactly as the model calls it
at inference (windowed corr, lane_warp dispatch, fused stacks)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = 8  # decoder batch (bs4 symmetric)


def timeit(fn, *args, iters=5, warmup=2):
    jfn = jax.jit(fn)
    for _ in range(warmup):
        r = jfn(*args)
    float(jnp.sum(jax.tree.leaves(r)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jfn(*args)
    float(jnp.sum(jax.tree.leaves(r)[0]))
    return (time.perf_counter() - t0) / iters


def rand(*shape, dtype=jnp.bfloat16, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), dtype)


def smooth_flow(h, w, amp=0.002, seed=3):
    # production-regime flow: smooth, ~<=2px local jitter (trained-warp-like)
    rs = np.random.RandomState(seed)
    gy, gx = np.meshgrid(
        np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij"
    )
    base = np.stack([gx, gy], -1)[None]
    lo = rs.randn(B, 12, 12, 2).astype(np.float32)
    # numpy bilinear upsample (host-side; keeps the TPU out of setup work)
    yi = np.linspace(0, 11, h); xi = np.linspace(0, 11, w)
    y0 = np.clip(yi.astype(int), 0, 10); x0 = np.clip(xi.astype(int), 0, 10)
    fy = (yi - y0)[None, :, None, None]; fx = (xi - x0)[None, None, :, None]
    g = lambda a, b: lo[:, a][:, :, b]
    sm = ((1-fy)*(1-fx)*g(y0, x0) + (1-fy)*fx*g(y0, x0+1)
          + fy*(1-fx)*g(y0+1, x0) + fy*fx*g(y0+1, x0+1))
    return jnp.asarray(
        base + 0.03 * sm + amp * rs.randn(B, h, w, 2), jnp.float32
    )


def main():
    from roma_tpu.models.config import RoMaConfig
    from roma_tpu.ops import grid_sample, local_correlation
    from roma_tpu.ops.lane_warp import warp_sample

    print(f"backend={jax.default_backend()} B={B}")
    cfg = RoMaConfig()
    proj = dict(cfg.proj_out)
    rad = dict(cfg.corr_radius)

    UP = [(8, 168), (4, 336), (2, 672), (1, 1344)]

    print("== warp_sample (model routing, inference) ==")
    for s, r_ in UP:
        c = proj[s]
        y = rand(B, r_, r_, c)
        fl = smooth_flow(r_, r_)
        dt = timeit(lambda y, fl: warp_sample(y, fl, inference=True), y, fl)
        print(f"  up s{s:>2} {r_}^2 C={c}: {dt*1e3:8.2f} ms", flush=True)

    print("== local_correlation (inference=True -> windowed) ==")
    for s, r_ in UP:
        rr = rad.get(s)
        if not rr:
            continue
        c = proj[s]
        f0 = rand(B, r_, r_, c)
        f1 = rand(B, r_, r_, c, seed=1)
        fl = smooth_flow(r_, r_)
        dt = timeit(
            lambda f0, f1, fl: local_correlation(f0, f1, rr, fl, inference=True),
            f0, f1, fl,
        )
        print(f"  up s{s:>2} {r_}^2 C={c} r={rr}: {dt*1e3:8.2f} ms", flush=True)

    print("== encoder at 1344 (upsample pass, VGG-only path) ==")
    from roma_tpu.models.encoders import CNNandDinov2

    enc = CNNandDinov2(config=cfg, dtype=jnp.bfloat16, coarse_dtype=jnp.bfloat16)
    x = rand(B, 1344, 1344, 3)  # bs4 pairs -> 8 images
    vs = jax.jit(lambda r, x: enc.init(r, x, upsample=True))(
        jax.random.PRNGKey(0), x[:2]
    )
    dt = timeit(lambda v, x: enc.apply(v, x, upsample=True), vs, x, iters=3)
    print(f"  VGG pyramid 1344^2 x{B}: {dt*1e3:8.2f} ms")

    print("== encoder at 672 (coarse pass, VGG + DINOv2) ==")
    x = rand(B, 672, 672, 3)
    vs = jax.jit(lambda r, x: enc.init(r, x, upsample=False))(
        jax.random.PRNGKey(0), x[:2]
    )
    dt = timeit(lambda v, x: enc.apply(v, x, upsample=False), vs, x, iters=3)
    print(f"  VGG+DINOv2 672^2 x{B}: {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
