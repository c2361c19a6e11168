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
@step("profile-dinov2-packed")
def pdv():
    # packed-attention A/B: single Block / 24-block stack now route the
    # packed kernel; the sdpa line still times the per-head kernel.
    import profile_dinov2

    profile_dinov2.main()


# ------------------------------------------------------------------ 2
@step("bench-e2e-560-864")
def bench_e2e():
    sys.path.insert(0, ROOT)
    import bench

    bench.main()


# ------------------------------------------------------------------ 3
@step("bench-1344")
def bench_golden():
    import bench_1344

    bench_1344.main()


# ------------------------------------------------------------------ 4
@step("train-step-bs8-retry")
def train_bs8():
    # GP + TransformerDecoder now remat under the same flag — retry bs8
    # (runtime alloc was just over 15.75 G before; ~0.5 G of GP f32
    # intermediates plus TD concat/head residuals were the margin).
    os.environ["ROMA_BENCH_BS"] = "8,6"
    import bench_train_step

    bench_train_step.main()


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
