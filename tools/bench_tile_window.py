"""windowed_warp (tile_window v2) vs plain grid_sample on the real TPU at
the matcher's scale-1 shapes, under realistic adversarial flows.

nohup python tools/bench_tile_window.py > /tmp/btw.log 2>&1 &
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_window import realistic_flow, timeit  # noqa: E402

from roma_tpu.ops.grid_sample import grid_sample
from roma_tpu.ops.tile_window import WarpSpec, windowed_warp

B = 16


def main():
    print(f"backend={jax.default_backend()}")
    for h, c in ((864, 9), (560, 9)):
        flow = realistic_flow(h, h)
        x = jnp.asarray(np.random.RandomState(1).randn(B, h, h, c), jnp.bfloat16)
        t0 = timeit(lambda x, f: grid_sample(x, f), x, flow, iters=20)
        print(f"== {h}^2 C={c} B={B}: plain {t0*1e3:8.2f} ms")
        for dots in ("bf16x2", "f32"):
            for ns, xq, wh in ((2, 128, 128), (3, 64, 128)):
                spec = WarpSpec(dots=dots, ns=ns, xq=xq, wh=wh)
                try:
                    t1 = timeit(
                        lambda x, f: windowed_warp(x, f, spec=spec),
                        x, flow, iters=20,
                    )
                    print(
                        f"   windowed dots={dots:6s} ns={ns} xq={xq:3d} wh={wh}:"
                        f" {t1*1e3:8.2f} ms  ({t0/t1:4.2f}x)"
                    )
                except Exception as e:
                    print(f"   windowed dots={dots} ns={ns} xq={xq} wh={wh}: FAIL {str(e)[:600]}")
        # correctness on-device vs plain
        spec = WarpSpec(ns=2, xq=128, wh=128)
        got = np.asarray(windowed_warp(x, flow, spec=spec), np.float32)
        ref = np.asarray(grid_sample(x, flow), np.float32)
        print(f"   max|delta| vs plain: {np.abs(got - ref).max():.5f}")


def corr_bench():
    from roma_tpu.ops.local_corr import local_correlation
    from roma_tpu.ops.tile_window import CorrSpec, windowed_local_corr

    for h, c, r in ((216, 256, 2), (108, 512, 3), (140, 256, 2), (70, 512, 3)):
        flow = realistic_flow(h, h)
        rs = np.random.RandomState(1)
        f0 = jnp.asarray(rs.randn(B, h, h, c), jnp.bfloat16)
        f1 = jnp.asarray(rs.randn(B, h, h, c), jnp.bfloat16)
        t0 = timeit(
            lambda a, b_, f: local_correlation(a, b_, r, f), f0, f1, flow, iters=10
        )
        print(f"== corr {h}^2 C={c} r={r}: current {t0*1e3:8.2f} ms")
        try:
            t1 = timeit(
                lambda a, b_, f: windowed_local_corr(a, b_, r, f),
                f0, f1, flow, iters=10,
            )
            print(f"   windowed (auto spec): {t1*1e3:8.2f} ms  ({t0/t1:4.2f}x)")
        except Exception as e:
            print(f"   windowed (auto spec): FAIL {str(e)[:600]}")
        got = np.asarray(
            windowed_local_corr(f0, f1, r, flow, spec=CorrSpec()), np.float32
        )
        ref = np.asarray(local_correlation(f0, f1, r, flow, method="patch"), np.float32)
        print(f"   max|delta| vs patch: {np.abs(got - ref).max():.5f}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "warp"):
        main()
    if which in ("all", "corr"):
        corr_bench()
