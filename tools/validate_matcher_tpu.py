"""End-to-end A/B validation of the windowed tile kernels inside the full
two-pass matcher on the real TPU: RegressionMatcher.match with the Pallas
paths routed vs ROMA_DISABLE_TILE_WINDOW=1 (pure-XLA gathers), same random
weights and inputs. Reports warp/certainty max-deltas and both wall-clocks.

nohup python tools/validate_matcher_tpu.py > /tmp/vm.log 2>&1 &
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 4
COARSE, UP = 560, 864


def build_and_run(tag):
    from roma_tpu.models.zoo import roma_outdoor

    from bench import smooth_coarse_warp

    model = roma_outdoor(coarse_res=COARSE, upsample_res=UP, amp=True)
    # Random weights emit noise warps, which the windowed corr's per-tile
    # budget cond routes to the XLA patch fallback in BOTH runs — the A/B
    # would then vacuously compare XLA against itself. Bias the coarse
    # classifier to one anchor so the ON run actually executes the Pallas
    # kernels (same rationale as bench.py).
    smooth_coarse_warp(model)
    rs = np.random.RandomState(0)
    im_A = jnp.asarray(rs.randn(BATCH, COARSE, COARSE, 3), model.dtype)
    im_B = jnp.asarray(rs.randn(BATCH, COARSE, COARSE, 3), model.dtype)
    im_A_u = jnp.asarray(rs.randn(BATCH, UP, UP, 3), model.dtype)
    im_B_u = jnp.asarray(rs.randn(BATCH, UP, UP, 3), model.dtype)

    warp, cert = model.match(im_A, im_B, im_A_high_res=im_A_u, im_B_high_res=im_B_u)
    float(jnp.sum(cert))
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        warp, cert = model.match(
            im_A, im_B, im_A_high_res=im_A_u, im_B_high_res=im_B_u
        )
        float(jnp.sum(cert))
    dt = (time.perf_counter() - t0) / iters
    print(
        f"{tag}: {dt*1e3:8.1f} ms/batch ({BATCH/dt:.2f} pairs/s)", flush=True
    )
    return np.asarray(warp, np.float32), np.asarray(cert, np.float32)


def main():
    os.environ.setdefault("ROMA_TPU_OFFLINE", "1")  # hermetic random-weight A/B
    print(f"backend={jax.default_backend()}")
    w1, c1 = build_and_run("windowed kernels ON ")
    os.environ["ROMA_DISABLE_TILE_WINDOW"] = "1"
    w2, c2 = build_and_run("windowed kernels OFF")
    dw = np.abs(w1 - w2)
    print(f"max|dwarp|: {dw.max():.5f}  p99: {np.percentile(dw, 99):.6f}")
    print(f"max|dcert|: {np.abs(c1 - c2).max():.5f}")


if __name__ == "__main__":
    main()
