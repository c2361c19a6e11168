"""Microbench: MXU one-hot contraction styles for the windowed sampler.

Q1: is one f32 weighted-one-hot dot faster or slower than two bf16 pure-0/1
dots (exact corner picks, f32 combine after)?
Q2: does a scalar-prefetch dynamic DMA window fetch work + cost vs XLA row
gather materialization?

Run detached: nohup python tools/bench_onehot_dots.py > /tmp/bd.log 2>&1 &
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=50, warmup=3):
    jfn = jax.jit(fn)
    for _ in range(warmup):
        r = jfn(*args)
    float(jnp.sum(jax.tree.leaves(r)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jfn(*args)
    float(jnp.sum(jax.tree.leaves(r)[0]))
    return (time.perf_counter() - t0) / iters


# --- E1: dot styles --------------------------------------------------------
# Tile shapes ~ v1 kernel: win (WH, C*WW), my (WH, QS). Grid of NT tiles.
WH, CWW, QS, NQ = 128, 1728, 1024, 4
NT = 3136  # 864^2 / 64^2 tiles * 16 images


def _kern_f32(win_ref, yl_ref, fy_ref, o_ref):
    def body(qb, _):
        sl = pl.ds(qb * QS, QS)
        yl = yl_ref[0, :, sl]
        fy = fy_ref[0, :, sl]
        ri = jax.lax.broadcasted_iota(jnp.int32, (WH, QS), 0)
        my = jnp.where(ri == yl, 1.0 - fy, 0.0) + jnp.where(ri == yl + 1, fy, 0.0)
        t1 = jax.lax.dot_general(
            win_ref[0].astype(jnp.float32), my, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = t1[:1]
        return _

    jax.lax.fori_loop(0, NQ, body, 0)


def _kern_2bf16(win_ref, yl_ref, fy_ref, o_ref):
    def body(qb, _):
        sl = pl.ds(qb * QS, QS)
        yl = yl_ref[0, :, sl]
        fy = fy_ref[0, :, sl]
        ri = jax.lax.broadcasted_iota(jnp.int32, (WH, QS), 0)
        my0 = (ri == yl).astype(jnp.bfloat16)
        my1 = (ri == yl + 1).astype(jnp.bfloat16)
        t0 = jax.lax.dot_general(
            win_ref[0], my0, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t1 = jax.lax.dot_general(
            win_ref[0], my1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        tm = t0 * (1.0 - fy) + t1 * fy
        o_ref[0, :, sl] = tm[:1]
        return _

    jax.lax.fori_loop(0, NQ, body, 0)


def run_dot(kern, win, yl, fy):
    t = NQ * QS
    return pl.pallas_call(
        kern,
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((1, WH, CWW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NT, 1, t), jnp.float32),
    )(win, yl, fy)


def e1():
    rs = np.random.RandomState(0)
    win = jnp.asarray(rs.randn(NT, WH, CWW), jnp.bfloat16)
    t = NQ * QS
    yl = jnp.asarray(rs.randint(0, WH - 1, (NT, 1, t)), jnp.int32)
    fy = jnp.asarray(rs.rand(NT, 1, t), jnp.float32)
    dt = timeit(functools.partial(run_dot, _kern_f32), win, yl, fy, iters=20)
    macs = NT * NQ * QS * WH * CWW
    print(f"E1 f32 single dot : {dt*1e3:8.2f} ms  ({macs/dt/1e12:6.1f} TMAC/s)")
    dt = timeit(functools.partial(run_dot, _kern_2bf16), win, yl, fy, iters=20)
    print(f"E1 2x bf16 dots   : {dt*1e3:8.2f} ms  ({2*macs/dt/1e12:6.1f} TMAC/s, counting both)")


# --- E2: dynamic DMA window fetch -----------------------------------------
# table (B, HP, NJ, XQC) in ANY; per tile DMA (WH, ns, XQC) via scalar oy/jx.
B2, HP, NJ, XQC = 16, 928, 8, 1152
NS = 3
NT2 = 189 * 16


def _dma_kernel(oy_ref, jx_ref, img_ref, tab_ref, o_ref, win, sem):
    i = pl.program_id(0)
    oy = oy_ref[i]
    jx = jx_ref[i]
    img = img_ref[i]
    for s in range(NS):
        cp = pltpu.make_async_copy(
            tab_ref.at[img, pl.ds(oy, WH), jx + s, :],
            win.at[:, pl.ds(s * XQC, XQC)],
            sem,
        )
        cp.start()
        cp.wait()
    o_ref[0, 0] = jnp.sum(win[...].astype(jnp.float32))


def e2():
    rs = np.random.RandomState(1)
    tab = jnp.asarray(rs.randn(B2, HP, NJ, XQC), jnp.bfloat16)
    oy = jnp.asarray(rs.randint(0, HP - WH, (NT2,)), jnp.int32)
    jx = jnp.asarray(rs.randint(0, NJ - NS, (NT2,)), jnp.int32)
    img = jnp.asarray(rs.randint(0, B2, (NT2,)), jnp.int32)

    def run(tab, oy, jx, img):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(NT2,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (1, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((WH, NS * XQC), jnp.bfloat16),
                pltpu.SemaphoreType.DMA,
            ],
        )
        return pl.pallas_call(
            _dma_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NT2, 1), jnp.float32),
        )(oy, jx, img, tab)

    dt = timeit(run, tab, oy, jx, img, iters=20)
    byts = NT2 * WH * NS * XQC * 2
    print(f"E2 DMA window fetch: {dt*1e3:8.2f} ms  ({byts/dt/1e9:6.1f} GB/s)")

    # XLA gather equivalent: rows (NT2*WH*NS) from (B2*HP*NJ, XQC)
    tabf = tab.reshape(B2 * HP * NJ, XQC)
    rows = (
        (img[:, None, None] * HP + oy[:, None, None] + jnp.arange(WH)[None, :, None])
        * NJ
        + jx[:, None, None]
        + jnp.arange(NS)[None, None, :]
    ).reshape(-1)

    def run_gather(tabf, rows):
        return jnp.take(tabf, rows, axis=0)

    dt = timeit(run_gather, tabf, rows, iters=20)
    print(f"E2 XLA row gather  : {dt*1e3:8.2f} ms  ({byts/dt/1e9:6.1f} GB/s)")


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}")
    e1()
    e2()
