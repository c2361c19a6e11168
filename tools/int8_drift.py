"""Full-dims int8-vs-f32 drift of the quantized paths (CPU, random weights).

Quantization error depends on channel count and weight/activation
distributions; the unit tests pin small dims, this measures the real ones:
DINOv2 ViT-L (24 blocks, d=1024, N=1601 tokens at the 560^2 coarse shape)
and a wide-C refiner hidden block (C=1137, the s8-up stack). Random weights
(no egress) — indicative of machinery error, not released-weight accuracy;
the golden-metric A/B (experiments/eval_roma_outdoor.py --vit_int8) is the
production gate.

python tools/int8_drift.py   # forces CPU, ~2-5 min
"""
from __future__ import annotations

import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax.numpy as jnp
import numpy as np


def report(name, a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    rms = np.sqrt(np.mean(a**2))
    print(
        f"  {name}: corr {np.corrcoef(a, b)[0, 1]:.6f}  "
        f"max|d|/rms {np.max(np.abs(a - b)) / rms:.4f}  "
        f"rms(d)/rms {np.sqrt(np.mean((a - b) ** 2)) / rms:.4f}",
        flush=True,
    )


def main():
    from roma_tpu.models.matcher import RefinerBlock
    from roma_tpu.models.vit import DinoV2

    rs = np.random.RandomState(0)

    print("DINOv2 ViT-L 560^2 (N=1601, d=1024, 24 blocks), int8 vs f32:")
    x = jnp.asarray(rs.randn(1, 560, 560, 3), jnp.float32)
    vit = DinoV2()
    v = jax.jit(vit.init)(jax.random.PRNGKey(0), x)
    ref = jax.jit(vit.apply)(v, x)
    got = jax.jit(DinoV2(int8=True).apply)(v, x)
    report("patch tokens (40x40x1024)", ref, got)

    print("Refiner hidden block C=1137 at 108^2 (s8-up shape), int8 vs f32:")
    h = jnp.asarray(rs.randn(1, 108, 108, 1137), jnp.float32)
    blk = RefinerBlock(out_dim=1137)
    vb = jax.jit(blk.init)(jax.random.PRNGKey(1), h)
    ref_b = jax.jit(blk.apply)(vb, h)
    got_b = jax.jit(RefinerBlock(out_dim=1137, int8=True).apply)(vb, h)
    report("block output", ref_b, got_b)


if __name__ == "__main__":
    main()
