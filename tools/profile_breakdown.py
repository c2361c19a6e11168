"""Per-op wall-clock breakdown of the big-RoMa two-pass match on the real TPU.

Times each hot component at its true shape (560 coarse + 864 upsample pass,
bs8 symmetric -> decoder batch 16) in isolation, so kernel work can be aimed
at the actual bottlenecks instead of round-1's remembered numbers.

Run:  python tools/profile_breakdown.py            (all groups)
      python tools/profile_breakdown.py gather     (one group)
"""
from __future__ import annotations

import os
import sys

# NOTE: repo root must be added AFTER interpreter startup — putting it in
# PYTHONPATH breaks the preloaded axon TPU plugin's registration.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from roma_tpu.models.config import RoMaConfig

B = 16  # decoder batch for bs8 symmetric


def timeit(fn, *args, iters=5, warmup=2):
    jfn = jax.jit(fn)
    for _ in range(warmup):
        r = jfn(*args)
    # tunneled TPU: host readback is the only reliable completion barrier
    float(jnp.sum(jax.tree.leaves(r)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jfn(*args)
    s = float(jnp.sum(jax.tree.leaves(r)[0]))
    dt = (time.perf_counter() - t0) / iters
    del s
    return dt


def rand(*shape, dtype=jnp.bfloat16, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), dtype)


def flow_like(h, w, seed=3):
    rs = np.random.RandomState(seed)
    gy, gx = np.meshgrid(
        np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij"
    )
    f = np.stack([gx, gy], -1)[None] + 0.05 * rs.randn(B, h, w, 2)
    return jnp.asarray(f, jnp.float32)


cfg = RoMaConfig()
proj = dict(cfg.proj_out)
rad = dict(cfg.corr_radius)

# (scale, res) pairs for both passes. Default = the 560->864 bench config
# (bs8 symmetric -> decoder batch 16); `--golden` switches to the 672->1344
# Mega-1500 eval config (bs4 symmetric -> decoder batch 8,
# reference experiments/eval_roma_outdoor.py:50-56).
if "--golden" in sys.argv:
    sys.argv.remove("--golden")
    B = 8
    COARSE = [(16, 42), (8, 84), (4, 168), (2, 336), (1, 672)]
    UP = [(8, 168), (4, 336), (2, 672), (1, 1344)]
else:
    COARSE = [(16, 35), (8, 70), (4, 140), (2, 280), (1, 560)]
    UP = [(8, 108), (4, 216), (2, 432), (1, 864)]


def group_gather():
    from roma_tpu.ops import grid_sample, local_correlation

    print("== grid_sample (x_hat lookup) ==")
    for name, pairs in (("coarse", COARSE), ("up", UP)):
        for s, r_ in pairs:
            c = proj[s]
            y = rand(B, r_, r_, c)
            fl = flow_like(r_, r_)
            dt = timeit(lambda y, fl: grid_sample(y, fl), y, fl)
            print(f"  {name} s{s:>2} {r_}^2 C={c}: {dt*1e3:8.2f} ms")

    print("== local_correlation ==")
    for name, pairs in (("coarse", COARSE), ("up", UP)):
        for s, r_ in pairs:
            rr = rad[s]
            if not rr:
                continue
            c = proj[s]
            f0 = rand(B, r_, r_, c)
            f1 = rand(B, r_, r_, c, seed=1)
            fl = flow_like(r_, r_)
            dt = timeit(
                lambda f0, f1, fl: local_correlation(f0, f1, rr, fl), f0, f1, fl
            )
            print(f"  {name} s{s:>2} {r_}^2 C={c} r={rr}: {dt*1e3:8.2f} ms")


def group_refiner():
    from roma_tpu.models.matcher import ConvRefiner

    print("== ConvRefiner (full: grid_sample+corr+convs) ==")
    for name, pairs in (("coarse", COARSE), ("up", UP)):
        for s, r_ in pairs:
            spec = cfg.refiner_specs()[s]
            c = proj[s]
            x = rand(B, r_, r_, c)
            y = rand(B, r_, r_, c, seed=1)
            fl = flow_like(r_, r_)
            mod = ConvRefiner(spec, dtype=jnp.bfloat16)
            vs = jax.jit(mod.init)(jax.random.PRNGKey(0), x[:1], y[:1], fl[:1])
            dt = timeit(lambda v, x, y, fl: mod.apply(v, x, y, fl), vs, x, y, fl)
            print(f"  {name} s{s:>2} {r_}^2 C={c}: {dt*1e3:8.2f} ms")


def group_blocks():
    from roma_tpu.models.matcher import RefinerBlock, ScannedRefinerBlocks

    print("== refiner conv stacks alone (block1 + 8 hidden) ==")
    for name, pairs in (("coarse", COARSE), ("up", UP)):
        for s, r_ in pairs:
            spec = cfg.refiner_specs()[s]
            d = rand(B, r_, r_, spec.in_dim)
            blk = dict(out_dim=spec.hidden_dim, kernel=5, dtype=jnp.bfloat16)

            class Stack:
                def init(self, rng, d):
                    self.b1 = RefinerBlock(**blk, name="b1")
                    self.hid = ScannedRefinerBlocks(
                        length=spec.hidden_blocks, block_kwargs=blk, name="h"
                    )

            import flax.linen as nn

            class StackM(nn.Module):
                @nn.compact
                def __call__(self, d):
                    d = RefinerBlock(**blk, name="b1")(d)
                    return ScannedRefinerBlocks(
                        length=spec.hidden_blocks, block_kwargs=blk, name="h"
                    )(d)

            mod = StackM()
            vs = jax.jit(mod.init)(jax.random.PRNGKey(0), d[:1])
            dt = timeit(lambda v, d: mod.apply(v, d), vs, d)
            print(f"  {name} s{s:>2} {r_}^2 C={spec.in_dim}: {dt*1e3:8.2f} ms")


def group_coarse():
    from roma_tpu.models.matcher import GP, TransformerDecoder

    print("== GP + TransformerDecoder @16 (35^2) ==")
    x = rand(B, 35, 35, 512, dtype=jnp.float32)
    y = rand(B, 35, 35, 512, dtype=jnp.float32, seed=1)
    gp = GP()
    vs = jax.jit(gp.init)(jax.random.PRNGKey(0), x[:1], y[:1])
    dt = timeit(lambda v, x, y: gp.apply(v, x, y), vs, x, y)
    print(f"  GP: {dt*1e3:8.2f} ms")

    td = TransformerDecoder(dtype=jnp.bfloat16)
    g = rand(B, 35, 35, 512)
    f = rand(B, 35, 35, 512, seed=1)
    vs = jax.jit(td.init)(jax.random.PRNGKey(0), g[:1], f[:1])
    dt = timeit(lambda v, g, f: td.apply(v, g, f)[0], vs, g, f)
    print(f"  TransformerDecoder: {dt*1e3:8.2f} ms")


def group_encoder():
    from roma_tpu.models.encoders import CNNandDinov2

    print("== encoder (VGG+DINOv2), batch 2B ==")
    for res, upsample in ((560, False), (864, True)):
        enc = CNNandDinov2(config=cfg, dtype=jnp.bfloat16, coarse_dtype=jnp.bfloat16)
        x = rand(2 * 8, res, res, 3)
        vs = jax.jit(lambda r, x: enc.init(r, x, upsample=upsample))(
            jax.random.PRNGKey(0), x[:2]
        )
        dt = timeit(
            lambda v, x: enc.apply(v, x, upsample=upsample), vs, x, iters=3
        )
        print(f"  {res} upsample={upsample}: {dt*1e3:8.2f} ms")


def group_interp():
    from roma_tpu.ops import interpolate

    print("== interpolate (flow/cert upsampling between scales) ==")
    for name, pairs in (("coarse", COARSE), ("up", UP)):
        for (s, r_), (s2, r2) in zip(pairs[:-1], pairs[1:]):
            f = rand(B, r_, r_, 3, dtype=jnp.float32)
            dt = timeit(lambda f: interpolate(f, (r2, r2), mode="bilinear"), f)
            print(f"  {name} {r_}->{r2}: {dt*1e3:8.2f} ms")


GROUPS = {
    "gather": group_gather,
    "refiner": group_refiner,
    "blocks": group_blocks,
    "coarse": group_coarse,
    "encoder": group_encoder,
    "interp": group_interp,
}

if __name__ == "__main__":
    which = sys.argv[1:] or list(GROUPS)
    print(f"backend={jax.default_backend()} devices={len(jax.devices())}")
    for g in which:
        GROUPS[g]()
