"""Phase-level wall-clock split of the production two-pass match.

Times the three jitted programs of RegressionMatcher.match separately
(_match_coarse / _match_upsample / _assemble) at production routing —
unlike tools/profile_breakdown.py, whose op groups time the *training*
paths (no inference=True), this measures exactly what the bench runs.

Run:  python tools/phase_timing.py            (560->864 bench config, bs8)
      python tools/phase_timing.py --golden   (672->1344 Mega-1500 config, bs4)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    golden = "--golden" in sys.argv
    coarse, up, batch = (672, 1344, 4) if golden else (560, 864, 8)

    from roma_tpu.models.zoo import roma_outdoor
    from bench import smooth_coarse_warp

    print(f"backend={jax.default_backend()}  config={coarse}->{up} bs{batch}")
    os.environ.setdefault("ROMA_TPU_OFFLINE", "1")
    model = roma_outdoor(coarse_res=coarse, upsample_res=up, amp=True)
    smooth_coarse_warp(model)

    rs = np.random.RandomState(0)
    im_A = jnp.asarray(rs.randn(batch, coarse, coarse, 3), model.dtype)
    im_B = jnp.asarray(rs.randn(batch, coarse, coarse, 3), model.dtype)
    im_A_u = jnp.asarray(rs.randn(batch, up, up, 3), model.dtype)
    im_B_u = jnp.asarray(rs.randn(batch, up, up, 3), model.dtype)

    sym = model.symmetric
    out_hw = model.get_output_resolution()

    def sync(r):
        # tunneled TPU: host readback is the only reliable completion barrier
        float(jnp.sum(jax.tree.leaves(r)[0]))

    def t(label, fn, iters=5):
        r = fn()  # compile + warmup
        sync(r)
        r = fn()
        sync(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        sync(r)
        dt = (time.perf_counter() - t0) / iters
        print(f"  {label:<28} {dt * 1e3:9.2f} ms")
        return r, dt

    (flow, cert, low, flow_f, cert_f), t_c = t(
        "coarse pass (672^2 full net)" if golden else "coarse pass (560^2)",
        lambda: model._match_coarse(sym, model.variables, im_A, im_B, out_hw, None),
    )
    (uflow, ucert), t_u = t(
        "upsample pass",
        lambda: model._match_upsample(
            sym, model.variables, im_A_u, im_B_u, flow_f, cert_f
        ),
    )
    _, t_a = t(
        "assemble",
        lambda: model._assemble(sym, uflow, ucert, low),
    )
    tot = t_c + t_u + t_a
    print(
        f"  total {tot * 1e3:.2f} ms -> {batch / tot:.3f} pairs/s"
        f"  (coarse {100 * t_c / tot:.0f}% / up {100 * t_u / tot:.0f}%)"
    )


if __name__ == "__main__":
    main()
