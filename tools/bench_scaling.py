"""Inference batch-size scaling at 560->864 (real TPU).

Also re-validates the e2e bs8 number after the local_correlation
jax.checkpoint wrap (must be free at inference — no grads, no residuals).

nohup python tools/bench_scaling.py > /tmp/bsc.log 2>&1 &
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
    from roma_tpu.models.zoo import roma_outdoor

    from bench import smooth_coarse_warp

    print(f"backend={jax.default_backend()}", flush=True)
    model = roma_outdoor(coarse_res=560, upsample_res=864, amp=True)
    smooth_coarse_warp(model)
    rs = np.random.RandomState(0)
    for b in (8, 12, 16):
        im_A = jnp.asarray(rs.randn(b, 560, 560, 3), model.dtype)
        im_B = jnp.asarray(rs.randn(b, 560, 560, 3), model.dtype)
        im_A_u = jnp.asarray(rs.randn(b, 864, 864, 3), model.dtype)
        im_B_u = jnp.asarray(rs.randn(b, 864, 864, 3), model.dtype)

        def run():
            w, c = model.match(
                im_A, im_B, im_A_high_res=im_A_u, im_B_high_res=im_B_u
            )
            return float(jnp.sum(c))

        try:
            run()
            iters = 8
            t0 = time.perf_counter()
            for _ in range(iters):
                run()
            dt = (time.perf_counter() - t0) / iters
            print(
                f"  560->864 bs{b}: {dt*1e3:.1f} ms/batch = "
                f"{b/dt:.3f} pairs/s/chip",
                flush=True,
            )
        except Exception as e:
            print(f"  bs{b} failed: {type(e).__name__}", flush=True)
            break


if __name__ == "__main__":
    main()
