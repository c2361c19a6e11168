"""v5e sweep for the wide-channel (C=64) lane_warp spec at the s2-upsample
x_hat shapes: 672^2 B=8 (golden 672->1344 config) and 432^2 B=16
(560->864 bench config). Picks wh/ns for _WIDE_C_SPEC and validates the
dispatch threshold."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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


def smooth_flow(b, h, w, jitter_px=2.0, seed=3):
    rs = np.random.RandomState(seed)
    gy, gx = np.meshgrid(
        np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij"
    )
    base = np.stack([gx, gy], -1)[None]
    amp = 2.0 * jitter_px / w
    return jnp.asarray(
        base + amp * rs.randn(b, h, w, 2), jnp.float32
    )


def main():
    from roma_tpu.ops.grid_sample import grid_sample
    from roma_tpu.ops.lane_warp import LaneSpec, lane_warp

    print(f"backend={jax.default_backend()}")
    for b, r in ((8, 672), (16, 432)):
        rs = np.random.RandomState(1)
        x = jnp.asarray(rs.randn(b, r, r, 64), jnp.bfloat16)
        fl = smooth_flow(b, r, r)
        dt = timeit(lambda x, fl: grid_sample(x, fl), x, fl)
        print(f"B={b} R={r} C=64 plain gather: {dt*1e3:8.2f} ms", flush=True)
        for th, tw, wh, ns, nbuf in (
            (16, 16, 48, 16, 2), (16, 16, 48, 16, 4), (16, 16, 48, 16, 8),
            (32, 32, 64, 24, 4), (16, 32, 48, 24, 4),
        ):
                spec = LaneSpec(th=th, tw=tw, xq=2, ns=ns, wh=wh, nbuf=nbuf)
                try:
                    dt = timeit(
                        lambda x, fl: lane_warp(x, fl, spec=spec), x, fl
                    )
                    print(
                        f"  lane t={th}x{tw} wh={wh} ns={ns} nbuf={nbuf}: {dt*1e3:8.2f} ms",
                        flush=True,
                    )
                except Exception as e:
                    print(f"  lane t={th}x{tw} wh={wh} ns={ns} nbuf={nbuf}: FAIL {type(e).__name__}: "
                          f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
