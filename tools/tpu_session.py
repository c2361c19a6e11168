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
@step("e2e-bench-560-864")
def e2e_bench():
    from roma_tpu.models.zoo import roma_outdoor

    from bench import smooth_coarse_warp

    model = roma_outdoor(coarse_res=560, upsample_res=864, amp=True)
    smooth_coarse_warp(model)
    rs = np.random.RandomState(0)
    B = 8
    im_A = jnp.asarray(rs.randn(B, 560, 560, 3), model.dtype)
    im_B = jnp.asarray(rs.randn(B, 560, 560, 3), model.dtype)
    im_A_u = jnp.asarray(rs.randn(B, 864, 864, 3), model.dtype)
    im_B_u = jnp.asarray(rs.randn(B, 864, 864, 3), model.dtype)

    def run():
        warp, cert = model.match(im_A, im_B, im_A_high_res=im_A_u, im_B_high_res=im_B_u)
        return float(jnp.sum(cert))

    run()
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    print(f"  560->864 bs8: {dt*1e3:.1f} ms/batch = {B/dt:.3f} pairs/s/chip", flush=True)

    os.environ["ROMA_DISABLE_TILE_WINDOW"] = "1"
    model2 = roma_outdoor(coarse_res=560, upsample_res=864, amp=True)
    smooth_coarse_warp(model2)
    w2, c2 = model2.match(im_A, im_B, im_A_high_res=im_A_u, im_B_high_res=im_B_u)
    float(jnp.sum(c2))
    t0 = time.perf_counter()
    for _ in range(3):
        w2, c2 = model2.match(im_A, im_B, im_A_high_res=im_A_u, im_B_high_res=im_B_u)
        float(jnp.sum(c2))
    dt2 = (time.perf_counter() - t0) / 3
    print(f"  560->864 bs8 (windowed OFF): {dt2*1e3:.1f} ms/batch", flush=True)
    w1, c1 = model.match(im_A, im_B, im_A_high_res=im_A_u, im_B_high_res=im_B_u)
    dw = np.abs(np.asarray(w1, np.float32) - np.asarray(w2, np.float32))
    dc = np.abs(np.asarray(c1, np.float32) - np.asarray(c2, np.float32))
    print(f"  A/B max|dwarp|={dw.max():.5f} p99={np.percentile(dw,99):.6f} max|dcert|={dc.max():.5f}", flush=True)
    del os.environ["ROMA_DISABLE_TILE_WINDOW"]


# ------------------------------------------------------------------ 3
@step("bench-672-1344")
def bench_1344():
    from roma_tpu.models.zoo import roma_outdoor

    from bench import smooth_coarse_warp

    model = roma_outdoor(coarse_res=672, upsample_res=1344, amp=True)
    smooth_coarse_warp(model)
    rs = np.random.RandomState(0)
    B = 4
    im_A = jnp.asarray(rs.randn(B, 672, 672, 3), model.dtype)
    im_B = jnp.asarray(rs.randn(B, 672, 672, 3), model.dtype)
    im_A_u = jnp.asarray(rs.randn(B, 1344, 1344, 3), model.dtype)
    im_B_u = jnp.asarray(rs.randn(B, 1344, 1344, 3), model.dtype)

    def run():
        warp, cert = model.match(im_A, im_B, im_A_high_res=im_A_u, im_B_high_res=im_B_u)
        return float(jnp.sum(cert))

    run()
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    print(f"  672->1344 bs4: {dt*1e3:.1f} ms/batch = {B/dt:.3f} pairs/s/chip", flush=True)


# ------------------------------------------------------------------ 3
@step("fullres-jax")
def fullres_jax():
    if not os.path.exists("/tmp/fullres_torch.npz"):
        print("  no torch cache; skipped", flush=True)
        return
    sys.argv = ["fullres_parity.py", "jax"]
    import fullres_parity

    fullres_parity.main()


# ------------------------------------------------------------------ 4
@step("hcw-bigC-record")
def hcw_bigc():
    import bench_hcw_refiner

    # C=144 numbers already recorded; the big-C shapes needed the
    # 8-aligned channel pad (Mosaic memref_slice rule).
    bench_hcw_refiner.SHAPES = [
        s for s in bench_hcw_refiner.SHAPES if s[2] > 144
    ]
    bench_hcw_refiner.main()


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
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
