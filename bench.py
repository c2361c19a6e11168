"""Benchmark: big-RoMa dense match throughput (pairs/sec/chip) at 560->864.

Mirrors the reference timing harness (tests/test_roma_upsample_inference_time.py:
bs8, 560 coarse + 864 upsample, bf16) but measures the full jitted two-pass
pipeline.

``vs_baseline`` is the ratio to THIS repo's round-1 measurement on the same
TPU v5e (BENCH_r01.json: 2.901 pairs/sec/chip) — i.e. measured self-progress.
The reference repo records no wall-clock numbers anywhere (BASELINE.md), and
no CUDA GPU exists in this environment to measure one, so no GPU ratio is
claimed.

Prints the headline metric as the FINAL JSON line (the driver parses the
tail). On TPU a secondary labeled line for the golden Mega-1500 eval config
(672->1344 bs4, reference experiments/eval_roma_outdoor.py:50-56) is printed
first; ROMA_BENCH_GOLDEN=0 skips it.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# measured: this repo, round 1, TPU v5e, 560->864 two-pass symmetric, bs8
ROUND1_PAIRS_PER_SEC = 2.901


def smooth_coarse_warp(model):
    """Make the benchmark's coarse matcher emit a coherent warp.

    With random fast-init weights the 64^2 anchor classification's
    per-pixel argmax is uniform noise — a warp no trained matcher
    produces. Zeroing the classifier head and biasing one anchor gives a
    constant coarse warp (plus the refiners' smooth deltas), which is what
    the production kernels see: the windowed local-correlation path's
    data-dependent budget check then routes exactly as it does with real
    weights (per-tile work is identical for ANY in-budget warp — static
    shapes — so this neither helps nor hurts beyond selecting the
    representative branch). No effect when real weights are loaded via
    ROMA_WEIGHTS.
    """
    import numpy as _np

    ed = model.variables["params"]["decoder"]["embedding_decoder"]["to_out"]
    bias = _np.zeros(ed["bias"].shape, _np.float32)
    bias[64 * 32 + 32] = 8.0  # mid-grid anchor
    ed["kernel"] = jnp.zeros_like(ed["kernel"])
    ed["bias"] = jnp.asarray(bias)


def main():
    import os

    # Hermetic by default: never block the bench on a weight download
    # attempt. Opt into pretrained runs explicitly via ROMA_WEIGHTS.
    if not os.environ.get("ROMA_WEIGHTS"):
        os.environ.setdefault("ROMA_TPU_OFFLINE", "1")

    from roma_tpu.models.zoo import roma_outdoor

    try:
        on_tpu = jax.default_backend() != "cpu"
    except RuntimeError:
        # tunneled TPU backend failed to initialize (e.g. tunnel down):
        # still emit a JSON line, clearly labeled as the CPU fallback
        jax.config.update("jax_platforms", "cpu")
        on_tpu = False

    def run_config(coarse, up, batch, iters):
        # real converted weights when provided (lets the bench double as an
        # end-to-end run of the released model). Without weights the coarse
        # classifier is biased to one anchor (smooth_coarse_warp) so the
        # windowed local-correlation path's data-dependent budget check
        # routes the way it does in production — shapes and per-tile work
        # are otherwise identical for any in-budget warp.
        model = roma_outdoor(
            weights=os.environ.get("ROMA_WEIGHTS"),
            dinov2_weights=os.environ.get("DINOV2_WEIGHTS"),
            coarse_res=coarse,
            upsample_res=up,
            amp=on_tpu,
        )
        if not os.environ.get("ROMA_WEIGHTS"):
            smooth_coarse_warp(model)
        rs = np.random.RandomState(0)
        im_A = jnp.asarray(rs.randn(batch, coarse, coarse, 3), model.dtype)
        im_B = jnp.asarray(rs.randn(batch, coarse, coarse, 3), model.dtype)
        im_A_u = jnp.asarray(rs.randn(batch, up, up, 3), model.dtype)
        im_B_u = jnp.asarray(rs.randn(batch, up, up, 3), model.dtype)

        def run():
            warp, cert = model.match(
                im_A, im_B, im_A_high_res=im_A_u, im_B_high_res=im_B_u
            )
            # NOTE: on the tunneled TPU platform block_until_ready returns
            # before execution finishes; a scalar host readback is the only
            # reliable completion barrier (~30ms round-trip per call).
            return float(jnp.sum(cert))

        run()  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            run()
        dt = time.perf_counter() - t0
        return batch * iters / dt

    # secondary labeled metric: the golden Mega-1500 eval config. Printed
    # BEFORE the headline line — the driver parses the tail.
    if on_tpu and os.environ.get("ROMA_BENCH_GOLDEN", "1") != "0":
        golden = run_config(672, 1344, 4, 5)
        print(
            json.dumps(
                {
                    "metric": "roma_outdoor_672to1344_bs4_pairs_per_sec_per_chip",
                    "value": round(golden, 4),
                    "unit": "pairs/sec",
                    "vs_baseline": 0.0,  # no round-1 anchor for this config
                }
            ),
            flush=True,
        )

    batch = 8 if on_tpu else 1
    coarse, up = (560, 864) if on_tpu else (140, 168)
    iters = 10 if on_tpu else 2
    pairs_per_sec = run_config(coarse, up, batch, iters)

    metric = f"roma_outdoor_{coarse}to{up}_bs{batch}_pairs_per_sec_per_chip"
    vs = round(pairs_per_sec / ROUND1_PAIRS_PER_SEC, 4)
    if not on_tpu:
        # CPU numbers are not comparable to the TPU round-1 anchor
        metric += "_CPU_FALLBACK"
        vs = 0.0
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(pairs_per_sec, 4),
                "unit": "pairs/sec",
                "vs_baseline": vs,
            }
        )
    )


if __name__ == "__main__":
    main()
