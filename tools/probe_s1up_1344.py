"""Dissect the golden-config top profile line: ConvRefiner up-s1
(1344^2, C=9 features, C=24 stack, decoder batch 8) — 596 ms in
tools/profile_breakdown.py --golden (round 5).

Times each component in isolation on the TPU:
  * warp_sample -> lane_warp (x_hat lookup, C=9)
  * disp embedding 1x1 conv
  * fused Pallas conv stack (9 folded blocks, C=24) at the current
    s_rows chunking, plus alternative s_rows values to test the
    wp=1408 tuning headroom
  * out_conv f32
  * the XLA scanned stack for reference

Run: python tools/probe_s1up_1344.py   (TPU, ~5 min)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, R, CF, CS = 8, 1344, 9, 24


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


def flow_like(h, w, seed=3):
    rs = np.random.RandomState(seed)
    gy, gx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij")
    f = np.stack([gx, gy], -1)[None] + 0.05 * rs.randn(B, h, w, 2)
    return jnp.asarray(f, jnp.float32)


def main():
    print(f"backend={jax.default_backend()}  B={B} R={R}")
    from roma_tpu.ops import grid_sample
    from roma_tpu.ops import pallas_refiner as pr
    from roma_tpu.ops.lane_warp import lane_warp

    y = rand(B, R, R, CF)
    fl = flow_like(R, R)
    print(f"lane_warp C={CF}:        {timeit(lambda y, f: lane_warp(y, f), y, fl):8.2f} ms")
    print(f"plain grid_sample C={CF}: {timeit(lambda y, f: grid_sample(y, f), y, fl):8.2f} ms")

    # folded conv stack (block1 + 8 hidden), C=24; dw_kernel flax layout
    # (K, K, 1, C) per fold_block's contract
    def mk_blocks():
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
    d = rand(B, R, R, CS, seed=5)
    dt = timeit(lambda d: pr.fused_refiner_stack(d, blocks), d)
    print(f"fused stack C={CS} (current s_rows): {dt:8.2f} ms")
    dt = timeit(lambda d: pr.refiner_stack_reference(d, blocks), d)
    print(f"XLA folded stack C={CS}:             {dt:8.2f} ms")

    # s_rows sweep via direct _fused_cmajor chunks
    for s_rows in (8, 12, 16, 20, 24):
        def run(d, s_rows=s_rows):
            x = d
            for i in range(0, 9, 3):
                x = pr._fused_cmajor(x, blocks[i:i+3], interpret=False, s_rows=s_rows)
            return x
        try:
            dt = timeit(run, d)
            print(f"  s_rows={s_rows:3d}: {dt:8.2f} ms")
        except Exception as e:
            print(f"  s_rows={s_rows:3d}: FAIL {type(e).__name__}: {str(e)[:120]}")

    # g sweep at the auto s_rows
    for g in (1, 2, 3, 4, 9):
        wp = 1408
        base = 40
        s_rows = max(2, min(base, int(base * (896 / wp) ** 2)))
        def run(d, g=g, s_rows=s_rows):
            x = d
            for i in range(0, 9, g):
                x = pr._fused_cmajor(x, blocks[i:i+g], interpret=False, s_rows=s_rows)
            return x
        try:
            dt = timeit(run, d)
            print(f"  g={g} s_rows={s_rows}: {dt:8.2f} ms")
        except Exception as e:
            print(f"  g={g}: FAIL {type(e).__name__}: {str(e)[:120]}")

    # out_conv f32 (24 -> 3) and disp_emb (2 -> 14 bf16)
    w = jnp.asarray(np.random.RandomState(9).randn(CS, 3) * 0.1, jnp.float32)
    dt = timeit(lambda d: jnp.einsum("bhwc,co->bhwo", d.astype(jnp.float32), w), d)
    print(f"out_conv f32 24->3: {dt:8.2f} ms")
    disp = rand(B, R, R, 2, dtype=jnp.float32, seed=11)
    wd = jnp.asarray(np.random.RandomState(12).randn(2, 14) * 0.1, jnp.bfloat16)
    dt = timeit(
        lambda x: jnp.einsum("bhwc,co->bhwo", x.astype(jnp.bfloat16), wd), disp
    )
    print(f"disp_emb 2->14:    {dt:8.2f} ms")


if __name__ == "__main__":
    main()
