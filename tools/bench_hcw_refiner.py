"""hcw_refiner_stack vs the model's scanned-XLA conv path at the real
refiner shapes (bs16, bf16, 9 blocks).

nohup python tools/bench_hcw_refiner.py > /tmp/bhr.log 2>&1 &
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_window import timeit

from roma_tpu.models.matcher import RefinerBlock, ScannedRefinerBlocks
from roma_tpu.ops import pallas_refiner as pr
from graveyard.pallas_hcw_refiner import hcw_refiner_stack

B = 16
SHAPES = [  # (scale tag, H, C)
    ("s8-up", 108, 1137),
    ("s4-up", 216, 569),
    ("s2-up", 432, 144),
    ("s16", 35, 1377),
    ("s8-c", 70, 1137),
    ("s4-c", 140, 569),
    ("s2-c", 280, 144),
]


def main():
    print(f"backend={jax.default_backend()}")
    rs = np.random.RandomState(0)
    for tag, h, c in SHAPES:
        x = jnp.asarray(rs.randn(B, h, h, c), jnp.bfloat16)
        blk = dict(out_dim=c, kernel=5, dtype=jnp.bfloat16)

        class StackM(nn.Module):
            @nn.compact
            def __call__(self, d):
                d = RefinerBlock(**blk, name="b1")(d)
                return ScannedRefinerBlocks(length=8, block_kwargs=blk, name="h")(d)

        mod = StackM()
        vs = jax.jit(mod.init)(jax.random.PRNGKey(0), x[:1])
        t0 = timeit(lambda v, d: mod.apply(v, d), vs, x, iters=10)
        print(f"{tag:6s} {h}^2 C={c}: XLA scanned {t0*1e3:8.2f} ms", flush=True)

        blocks = [
            {k: jnp.asarray(v) for k, v in b.items()}
            for b in (pr.fold_block(
                np.asarray(rs.randn(5, 5, 1, c) * 0.2, np.float32),
                np.asarray(rs.randn(c) * 0.1, np.float32),
                np.asarray(1 + 0.1 * rs.randn(c), np.float32),
                np.asarray(0.1 * rs.randn(c), np.float32),
                np.asarray(0.05 * rs.randn(c), np.float32),
                np.asarray(np.abs(1 + 0.2 * rs.randn(c)), np.float32),
                np.asarray(rs.randn(1, 1, c, c) * (1.5 / np.sqrt(c)), np.float32),
                np.asarray(rs.randn(c) * 0.1, np.float32),
            ) for _ in range(9))
        ]
        try:
            t1 = timeit(lambda d: hcw_refiner_stack(d, blocks), x, iters=10)
            print(f"{' ':6s} hcw kernel          {t1*1e3:8.2f} ms  ({t0/t1:4.2f}x)", flush=True)
        except Exception as e:
            print(f"{' ':6s} hcw kernel FAIL {str(e)[:400]}", flush=True)


if __name__ == "__main__":
    main()
