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
@step("train-step-560-remat")
def train_step():
    # without remat bs2 already OOMs (bs8 wants 48 G vs 15.75 G HBM);
    # ROMA_BENCH_REMAT defaults to 1 in the tool now.
    import bench_train_step

    bench_train_step.main()


# ------------------------------------------------------------------ 2
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
