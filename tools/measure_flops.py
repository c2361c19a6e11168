"""Measure per-pair HLO FLOPs of the two-pass match pipeline.

Runs XLA's HLO cost analysis on the *lowered* coarse + upsample programs
(bench.py pipeline_flops) on the XLA:CPU backend — the tunneled axon TPU
platform returns None from cost_analysis, so bench.py pins these values in
MEASURED_FLOPS_PER_PAIR. Re-run after any architecture change and update
that table (and the BASELINE.md "A100 estimate" derivation, which uses the
same numbers):

    python tools/measure_flops.py

Lowering only (no compile): ~15 s per config on the 1-core host.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

os.environ.setdefault("ROMA_TPU_OFFLINE", "1")


def main():
    from bench import pipeline_flops
    from roma_tpu.models.zoo import roma_outdoor

    for coarse, up in ((560, 864), (672, 1344)):
        t0 = time.time()
        model = roma_outdoor(
            weights=None, dinov2_weights=None,
            coarse_res=coarse, upsample_res=up, amp=True,
        )
        rs = np.random.RandomState(0)
        im = lambda r: jnp.asarray(rs.randn(1, r, r, 3), model.dtype)
        fl = pipeline_flops(
            model, im(coarse), im(coarse), im(up), im(up),
            model.get_output_resolution(),
        )
        print(f"({coarse}, {up}): {fl:.4g} FLOP/pair "
              f"[{fl/1e12:.3f} TFLOP, {time.time()-t0:.0f}s]")


if __name__ == "__main__":
    main()
