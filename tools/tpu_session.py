"""One serialized TPU session running every pending measurement — the
tunnel wedges when clients are killed or run concurrently, so everything
goes through a single long-lived process, in priority order, with
per-step logs. Safe to re-run; each step is independent.

nohup python tools/tpu_session.py > /tmp/ts.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))
os.environ.setdefault("ROMA_TPU_OFFLINE", "1")  # hermetic benches

import jax
import jax.numpy as jnp
import numpy as np


def step(name):
    def deco(fn):
        STEPS.append((name, fn))
        return fn

    return deco


STEPS = []


# ------------------------------------------------------------------ 1
@step("cmajor-s1-timing")
def cmajor_s1():
    """In-model Pallas cmajor kernel vs the XLA folded path at the scale-1
    refiner stack shapes (ts9: XLA scanned flax stack = 148 / 340 ms)."""
    from profile_window import timeit

    from roma_tpu.ops import pallas_refiner as pr

    rs = np.random.RandomState(0)
    for tag, h, c in (("s1-c", 560, 24), ("s1-up", 864, 24)):
        x = jnp.asarray(rs.randn(16, h, h, c), jnp.bfloat16)
        blocks = [
            {k: jnp.asarray(v) for k, v in pr.fold_block(
                np.asarray(rs.randn(5, 5, 1, c) * 0.2, np.float32),
                np.asarray(rs.randn(c) * 0.1, np.float32),
                np.asarray(1 + 0.1 * rs.randn(c), np.float32),
                np.asarray(0.1 * rs.randn(c), np.float32),
                np.asarray(0.1 * rs.randn(c), np.float32),
                np.asarray(1 + 0.1 * rs.randn(c), np.float32),
                np.asarray(rs.randn(c, c) * 0.1, np.float32),
                np.asarray(rs.randn(c) * 0.1, np.float32),
            ).items()}
            for _ in range(9)
        ]
        tk = timeit(lambda x: pr.fused_refiner_stack(x, blocks), x, iters=20)
        tx = timeit(lambda x: pr.refiner_stack_reference(x, blocks), x, iters=10)
        print(
            f"  {tag} {h}^2 C={c} bs16: cmajor {tk*1e3:7.2f} ms | "
            f"XLA folded {tx*1e3:7.2f} ms",
            flush=True,
        )


# ------------------------------------------------------------------ 2
@step("train-step-560")
def train_step():
    import bench_train_step

    bench_train_step.main()


# ------------------------------------------------------------------ 3
@step("tiny-and-coarse")
def tiny_coarse():
    import bench_tiny_coarse

    bench_tiny_coarse.main()


def main():
    print(f"backend={jax.default_backend()} devices={len(jax.devices())}", flush=True)
    for name, fn in STEPS:
        print(f"== {name} ==", flush=True)
        t0 = time.time()
        try:
            fn()
            print(f"== {name} done in {time.time()-t0:.0f}s ==", flush=True)
        except Exception:
            traceback.print_exc()
            print(f"== {name} FAILED after {time.time()-t0:.0f}s ==", flush=True)


if __name__ == "__main__":
    main()
