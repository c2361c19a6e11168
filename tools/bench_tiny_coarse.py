"""TinyRoMa throughput + big-RoMa coarse-only throughput (real TPU).

Two reference harnesses not yet measured on silicon:
  * TinyRoMa dense match (reference tests/test_tiny_roma.py semantics;
    XFeat-backbone speed model) at 560x560, bs8.
  * big-RoMa coarse-only 560^2 bs8 (reference
    tests/test_roma_coarse_inference_time.py: bs8 @560^2, bf16) —
    the upsample=False single-pass path.

nohup python tools/bench_tiny_coarse.py > /tmp/btc5.log 2>&1 &
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ROMA_TPU_OFFLINE", "1")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rs = np.random.RandomState(0)
    B = 8

    # ---- TinyRoMa ----
    from roma_tpu.models.zoo import tiny_roma_v1_outdoor

    tiny = tiny_roma_v1_outdoor(dtype=jnp.bfloat16)
    im_A = jnp.asarray(rs.rand(B, 560, 560, 3), jnp.bfloat16)
    im_B = jnp.asarray(rs.rand(B, 560, 560, 3), jnp.bfloat16)
    warp, cert = tiny.match(im_A, im_B)
    float(jnp.sum(cert))
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        warp, cert = tiny.match(im_A, im_B)
        float(jnp.sum(cert))
    dt = (time.perf_counter() - t0) / iters
    print(
        f"  tiny 560^2 bs{B}: {dt*1e3:.1f} ms/batch = {B/dt:.2f} pairs/s/chip",
        flush=True,
    )

    # ---- big RoMa coarse-only ----
    from roma_tpu.models.zoo import roma_outdoor

    from bench import smooth_coarse_warp

    model = roma_outdoor(coarse_res=560, upsample_preds=False, amp=True)
    smooth_coarse_warp(model)
    im_A = jnp.asarray(rs.randn(B, 560, 560, 3), model.dtype)
    im_B = jnp.asarray(rs.randn(B, 560, 560, 3), model.dtype)

    def run():
        w_, c_ = model.match(im_A, im_B)
        return float(jnp.sum(c_))

    run()
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    print(
        f"  coarse-only 560^2 bs{B}: {dt*1e3:.1f} ms/batch = "
        f"{B/dt:.2f} pairs/s/chip",
        flush=True,
    )


if __name__ == "__main__":
    main()
