"""A/B the grid_sample BIG_TABLE_BYTES regime at the golden-config s1-up
shape (1344^2, C=9, decoder batch 8).

At 864^2 the packed corner table is 60 MB (< threshold, batched); at 1344^2
it is 145 MB (> threshold, per-image lax.map). This probes whether the
100 MB cliff measured at the bench config still holds in the golden regime
(VERDICT r3 item 4: retune regime knobs at 1344).

Run: python tools/probe_bigtable_1344.py   (TPU, ~2 min)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from roma_tpu.ops import grid_sample as gs_mod


def flow_like(b, h, w, seed=3):
    rs = np.random.RandomState(seed)
    gy, gx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij")
    f = np.stack([gx, gy], -1)[None] + 0.05 * rs.randn(b, h, w, 2)
    return jnp.asarray(f, jnp.float32)


def timeit(fn, *args, iters=8):
    float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jnp.sum(r))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rs = np.random.RandomState(0)
    for b, hw, c in ((8, 1344, 9), (8, 672, 9), (16, 864, 9)):
        x = jnp.asarray(rs.randn(b, hw, hw, c), jnp.bfloat16)
        g = flow_like(b, hw, hw)
        for name, thresh in (("mapped(cur)", None), ("batched", 1 << 60)):
            old = gs_mod.BIG_TABLE_BYTES
            if thresh is not None:
                gs_mod.BIG_TABLE_BYTES = thresh
            try:
                f = jax.jit(lambda x, g: gs_mod.grid_sample(x, g))
                dt = timeit(f, x, g)
                print(f"  {hw}^2 b{b} C={c} {name}: {dt:7.2f} ms", flush=True)
            except Exception as e:
                print(f"  {hw}^2 b{b} C={c} {name}: FAILED {type(e).__name__}", flush=True)
            finally:
                gs_mod.BIG_TABLE_BYTES = old


if __name__ == "__main__":
    main()
