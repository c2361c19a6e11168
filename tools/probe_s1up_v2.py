"""s1-up probe round 2 (golden-config perf, VERDICT r4 item 4).

Round-1 findings (tools/probe_s1up_1344.py, v5e, B=8, 1344^2):
  * lane_warp 355.7 ms ~= plain gather 343.9 ms — but the probe flow had
    0.05 *normalized* jitter = 34 px at 1344, which overflows the 64-row
    windows and likely triggers the whole-batch fallback. Production s1-up
    warps are locally smooth (a few px of local deviation).
  * fused stack (C=24): current auto chunking (g=3, s_rows=16) 195.9 ms;
    sweep found g=2/s16 141.3 ms. XLA reference 234.8.

This round measures with PIXEL-scaled flow jitter (production regime),
prints the planner's counts (nfix/nbad/fallback), and finishes the chunk
sweep at both widths (864 and 1344) so the heuristic change is grounded.

Run: python tools/probe_s1up_v2.py   (TPU, ~6 min)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=6):
    jfn = jax.jit(fn)
    for _ in range(2):
        r = jfn(*args)
    float(jnp.sum(jax.tree.leaves(r)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jfn(*args)
    float(jnp.sum(jax.tree.leaves(r)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def rand(*shape, dtype=jnp.bfloat16, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), dtype)


def smooth_flow_px(b, h, w, jitter_px=4.0, seed=3):
    """Identity + gentle global warp + jitter expressed in PIXELS (the
    production regime: the s1 warp arrives refined and locally smooth)."""
    rs = np.random.RandomState(seed)
    gy, gx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij")
    f = np.stack([gx, gy], -1)[None].repeat(b, 0)
    # global smooth deformation ~ +-20 px
    f = f + (20.0 / (w / 2)) * np.sin(
        np.pi * (1.3 * gy + 0.7 * gx)
    )[None, ..., None] * rs.uniform(0.5, 1.0, (b, 1, 1, 2))
    f = f + (jitter_px / (w / 2)) * rs.randn(b, h, w, 2)
    return jnp.asarray(f, jnp.float32)


def main():
    print(f"backend={jax.default_backend()}")
    from roma_tpu.ops import grid_sample
    from roma_tpu.ops import pallas_refiner as pr
    from roma_tpu.ops.lane_warp import LaneSpec, _row_block, lane_warp
    from roma_tpu.ops.tile_window import WarpSpec, _plan

    spec = LaneSpec()

    def plan_counts(f, R):
        pspec = WarpSpec(th=spec.th, tw=spec.tw, wh=spec.wh, xq=spec.xq,
                         ns=spec.ns, pm=spec.pm, kf=spec.kf)
        p = _plan(f, R, R, pspec, oy_quant=16)
        counts = np.asarray(p["counts"]).reshape(-1)
        bnt = counts.size
        ntfix = min(bnt, max(64, bnt // spec.ntfix_div))
        return dict(
            bnt=bnt, miss_tiles=int((counts > 0).sum()),
            over_kf=int((counts > spec.kf).sum()),
            ntfix=ntfix, nt_bad=spec.nt_bad,
            windowed=bool(((counts > spec.kf).sum() <= spec.nt_bad)
                          and ((counts > 0).sum() <= ntfix)),
        )

    # ---- lane_warp under production-smooth flows, both resolutions ----
    for R, B in ((864, 16), (1344, 8)):
        y = rand(B, R, R, 9)
        for jit_px in (2.0, 4.0, 8.0):
            fl = smooth_flow_px(B, R, R, jitter_px=jit_px)
            t_lane = timeit(lambda y, f: lane_warp(y, f), y, fl)
            t_plain = timeit(lambda y, f: grid_sample(y, f), y, fl)
            print(f"R={R} B={B} jitter={jit_px}px: lane {t_lane:7.2f} ms  "
                  f"plain {t_plain:7.2f} ms  plan={plan_counts(fl, R)}",
                  flush=True)
        fl_adv = smooth_flow_px(B, R, R, jitter_px=4.0) + 0.05 * jnp.asarray(
            np.random.RandomState(9).randn(B, R, R, 2), jnp.float32
        )
        print(f"  plan[+0.05norm jitter] = {plan_counts(fl_adv, R)}", flush=True)

    # ---- fused stack chunk sweep at both widths ----
    def mk_blocks(CS=24):
        out = []
        for i in range(9):
            rs2 = np.random.RandomState(i)
            out.append(pr.fold_block(
                jnp.asarray(rs2.randn(5, 5, 1, CS) * 0.1, jnp.float32),
                jnp.asarray(rs2.randn(CS) * 0.1, jnp.float32),
                jnp.ones(CS), jnp.zeros(CS), jnp.zeros(CS), jnp.ones(CS),
                jnp.asarray(rs2.randn(1, 1, CS, CS) * 0.1, jnp.float32),
                jnp.asarray(rs2.randn(CS) * 0.1, jnp.float32),
            ))
        return out

    blocks = mk_blocks()
    for R, B in ((864, 16), (1344, 8)):
        d = rand(B, R, R, 24, seed=5)
        cur = timeit(lambda d: pr.fused_refiner_stack(d, blocks), d)
        print(f"R={R} fused stack current: {cur:7.2f} ms", flush=True)
        for g in (2, 3):
            for s_rows in ((12, 16) if R == 1344 else (28, 40)):
                def run(d, g=g, s_rows=s_rows):
                    x = d
                    for i in range(0, 9, g):
                        x = pr._fused_cmajor(x, blocks[i:i+g],
                                             interpret=False, s_rows=s_rows)
                    return x
                try:
                    dt = timeit(run, d)
                    print(f"  g={g} s_rows={s_rows}: {dt:7.2f} ms", flush=True)
                except Exception as e:
                    print(f"  g={g} s_rows={s_rows}: FAIL {str(e)[:90]}")


if __name__ == "__main__":
    main()
