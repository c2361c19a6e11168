"""Scaling diagnostic for windowed_local_corr: which axis does runtime
follow — grid steps (fixed overhead), window bytes (DMA), or constant
(XLA prep)?  nohup python tools/bench_corr_diag.py > /tmp/bcd.log 2>&1 &
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_window import realistic_flow, timeit

from roma_tpu.ops.tile_window import CorrSpec, windowed_local_corr
from roma_tpu.ops import tile_window as tws

B = 16


def main():
    print(f"backend={jax.default_backend()}")
    h, r = 216, 2
    flow = realistic_flow(h, h)
    rs = np.random.RandomState(1)
    for c in (256, 128):
        f0 = jnp.asarray(rs.randn(B, h, h, c), jnp.bfloat16)
        f1 = jnp.asarray(rs.randn(B, h, h, c), jnp.bfloat16)
        for spec, tag in (
            (CorrSpec(), "th16 wh48"),
            (CorrSpec(th=32, tw=32, wh=64, xq=8, ns=10), "th32 wh80"),
        ):
            t1 = timeit(
                lambda a, b_, f: windowed_local_corr(a, b_, r, f, spec=spec),
                f0, f1, flow, iters=10,
            )
            nt = (-(-h // spec.th)) ** 2 * B
            print(
                f"C={c} {tag}: {t1*1e3:8.2f} ms   grid={nt * (c // 128)}"
            )

    # XLA prep alone: plan + compaction + fixup values + f0 tiling
    c = 256
    f0 = jnp.asarray(rs.randn(B, h, h, c), jnp.bfloat16)
    f1 = jnp.asarray(rs.randn(B, h, h, c), jnp.bfloat16)
    spec = CorrSpec()

    def prep(f0, f1, flow):
        plan = tws._plan(flow, h, h, spec, radius=r)
        bnt = B * plan["nt"]
        t = spec.t
        fpos = tws._compact_miss(plan["needfix"].reshape(bnt, 1, t), t, spec.kf)
        sel = jnp.minimum(fpos[:, :, 0], t - 1)
        f0t = tws._tile_vector_fields(f0, h, h, spec.th, spec.tw)
        f0r = jnp.swapaxes(f0t, 1, 2)
        y0_k = jnp.take_along_axis(plan["y0t"].reshape(bnt, t), sel, axis=1)
        return fpos, f0r, y0_k, plan["oy"], plan["jx"], plan["counts"]

    tp = timeit(prep, f0, f1, flow, iters=10)
    print(f"prep (plan+compact+tile): {tp*1e3:8.2f} ms")

    # table build alone
    def table(f1):
        pm, xq, ns, cc = spec.pm, spec.xq, spec.ns, spec.cc
        wpx = -(-(h + 2 * pm) // xq) * xq
        nc = c // cc
        xp = jnp.pad(f1, ((0, 0), (pm, pm), (pm, wpx - h - pm), (0, 0)))
        return xp.reshape(B, h + 2 * pm, wpx // xq, xq, nc, cc).transpose(
            4, 0, 1, 2, 3, 5
        )

    tt = timeit(table, f1, iters=10)
    print(f"table build:              {tt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
