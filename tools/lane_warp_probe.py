"""Silicon A/B: lane-packed windowed warp (v3) vs the plain packed gather.

Shapes are the production x_hat lookups this kernel targets: s1-coarse
(560^2) and s1-up (864^2 / 1344^2) at C=9 bf16, decoder batch 16 (bs8
pairs, two-pass symmetric).  Flows are smooth synthetic warps of the kind
trained RoMa produces (the production dispatch regime) plus an
adversarial mix to check the budget/cond behavior.

Usage: python tools/lane_warp_probe.py [--sizes 560,864,1344] [--iters 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from roma_tpu.ops.grid_sample import grid_sample
from roma_tpu.ops.lane_warp import LaneSpec, lane_warp


def smooth_flow(h, w, b, seed=0, amp=0.08, scale_jitter=0.15):
    """Identity + low-frequency smooth displacement + mild scale change."""
    rs = np.random.RandomState(seed)
    gy, gx = np.meshgrid(
        np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij"
    )
    base = np.stack([gx, gy], -1)[None].repeat(b, 0)
    # low-frequency fields: a few random sinusoids per image
    f = base * (1.0 + scale_jitter * rs.randn(b, 1, 1, 2))
    for _ in range(3):
        ky, kx = rs.uniform(0.5, 3.0, 2)
        ph = rs.uniform(0, 2 * np.pi, (b, 1, 1, 2))
        f = f + amp / 3 * np.sin(
            np.pi * (ky * gy + kx * gx)[None, ..., None] + ph
        )
    return jnp.asarray(f, jnp.float32)


def adversarial_flow(h, w, b, seed=1):
    rs = np.random.RandomState(seed)
    f = np.array(smooth_flow(h, w, b, seed))
    f[:, : h // 4] -= 3.0                      # off-image band
    sp = rs.rand(b, h, w) < 0.02               # speckle outliers
    f[..., 0] += np.where(sp, rs.randn(b, h, w), 0.0)
    f[..., 1] += np.where(sp, rs.randn(b, h, w), 0.0)
    return jnp.asarray(f, jnp.float32)


def bench(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def miss_stats(x, flow, spec):
    from roma_tpu.ops.lane_warp import _row_block
    from roma_tpu.ops.tile_window import WarpSpec, _plan

    rb = _row_block(x.dtype)
    pspec = WarpSpec(
        th=spec.th, tw=spec.tw, wh=spec.wh, xq=spec.xq, ns=spec.ns,
        pm=spec.pm, kf=spec.kf,
    )
    p = jax.jit(lambda f: _plan(f, x.shape[1], x.shape[2], pspec, oy_quant=rb)["counts"])(flow)
    c = np.asarray(p).reshape(-1)
    return dict(
        mean=float(c.mean()), p99=float(np.percentile(c, 99)),
        max=int(c.max()), over=int((c > spec.kf).sum()), ntiles=len(c),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="560,864")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--c", type=int, default=9)
    ap.add_argument("--wh", type=int, default=64)
    ap.add_argument("--ns", type=int, default=5)
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    spec = LaneSpec(wh=args.wh, ns=args.ns)
    for hw in (int(s) for s in args.sizes.split(",")):
        b, c = args.batch, args.c
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(b, hw, hw, c), jnp.bfloat16)
        for kind, mk in (("smooth", smooth_flow), ("advers", adversarial_flow)):
            flow = mk(hw, hw, b)
            ms = miss_stats(x, flow, spec)
            print(f"{hw} {kind}: compiling plain...", flush=True)
            t_plain = bench(jax.jit(grid_sample), x, flow, iters=args.iters)
            print(f"  plain {t_plain:.2f} ms; compiling lane...", flush=True)
            t_lane = bench(
                jax.jit(lambda a, f: lane_warp(a, f, spec=spec)), x, flow,
                iters=args.iters,
            )
            # parity on this input
            d = np.abs(
                np.asarray(lane_warp(x, flow, spec=spec), np.float32)
                - np.asarray(grid_sample(x, flow), np.float32)
            )
            print(
                f"{hw}^2 c{c} b{b} {kind}: plain {t_plain:7.2f} ms  "
                f"lane {t_lane:7.2f} ms  ({t_plain / t_lane:4.2f}x)  "
                f"maxd {d.max():.2e}  "
                f"miss mean {ms['mean']:.1f} p99 {ms['p99']:.0f} "
                f"max {ms['max']} over {ms['over']}/{ms['ntiles']}"
            )


if __name__ == "__main__":
    main()
