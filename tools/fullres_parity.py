"""Full-resolution (560^2 coarse -> 864^2 upsample) numerics pin:
torch-CPU executable spec (tests/test_roma_parity.py, f32) vs the TPU bf16
pipeline, real two-pass wiring (roma.py _match_coarse/_match_upsample).

Records per-scale max|delta flow| (normalized and px) and max|delta
certainty|; writes PARITY_FULLRES.json at the repo root.

Runtime: the torch pass is ~2 TFLOP on one CPU core (tens of minutes).
Run detached:  nohup python tools/fullres_parity.py > /tmp/fp.log 2>&1 &
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np
import torch

import tests.test_roma_parity as trp  # executable torch spec + converter

COARSE = 560
UP = 864


def main():
    torch.manual_seed(0)
    spec = trp.RoMaSpec().eval()
    for m in spec.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.8, 1.2)
    roma_sd, dinov2_sd = trp.spec_state_dicts(spec)

    rng = np.random.RandomState(7)
    im_A = (rng.randn(1, COARSE, COARSE, 3) * 0.5).astype(np.float32)
    im_B = (rng.randn(1, COARSE, COARSE, 3) * 0.5).astype(np.float32)
    # high-res pass re-reads the images at 864 in the real pipeline; for the
    # pin we use independent random content at 864 (the net only connects
    # the passes through flow/certainty, exactly like matcher.py:853-889)
    im_A_u = (rng.randn(1, UP, UP, 3) * 0.5).astype(np.float32)
    im_B_u = (rng.randn(1, UP, UP, 3) * 0.5).astype(np.float32)

    sf_c = 1.0
    sf_u = math.sqrt(UP * UP / (COARSE * COARSE))

    t0 = time.time()
    with torch.no_grad():
        tc = spec(
            torch.tensor(im_A).permute(0, 3, 1, 2),
            torch.tensor(im_B).permute(0, 3, 1, 2),
            symmetric=True,
            scale_factor=sf_c,
        )
        print(f"torch coarse pass done in {time.time()-t0:.0f}s", flush=True)
        t1 = time.time()
        tu = spec(
            torch.tensor(im_A_u).permute(0, 3, 1, 2),
            torch.tensor(im_B_u).permute(0, 3, 1, 2),
            symmetric=True,
            upsample=True,
            flow=tc[1]["flow"],
            certainty=tc[1]["certainty"],
            scale_factor=sf_u,
        )
        print(f"torch upsample pass done in {time.time()-t1:.0f}s", flush=True)

    # ---- JAX side (TPU bf16 when available) -------------------------------
    import jax
    import jax.numpy as jnp

    from roma_tpu.models.matcher import RoMaNet
    from roma_tpu.models.zoo import convert

    variables = convert.convert_roma(roma_sd, dinov2_sd)
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    net = RoMaNet(dtype=dtype, coarse_dtype=dtype)

    t2 = time.time()
    jc = jax.jit(
        lambda v, a, b: net.apply(v, a, b, symmetric=True, scale_factor=sf_c)
    )(variables, jnp.asarray(im_A), jnp.asarray(im_B))
    jc = jax.tree.map(np.asarray, jc)
    print(f"jax coarse pass done in {time.time()-t2:.0f}s ({jax.default_backend()})", flush=True)
    t3 = time.time()
    ju = jax.jit(
        lambda v, a, b, f, c: net.apply(
            v, a, b, symmetric=True, upsample=True, flow=f, certainty=c,
            scale_factor=sf_u,
        )
    )(
        variables,
        jnp.asarray(im_A_u),
        jnp.asarray(im_B_u),
        jnp.asarray(tc[1]["flow"].permute(0, 2, 3, 1).numpy()),
        jnp.asarray(tc[1]["certainty"].permute(0, 2, 3, 1).numpy()),
    )
    ju = jax.tree.map(np.asarray, ju)
    print(f"jax upsample pass done in {time.time()-t3:.0f}s", flush=True)

    report = {
        "config": f"{COARSE}->{UP} symmetric b=1",
        "jax_backend": jax.default_backend(),
        "jax_dtype": str(dtype.__name__ if hasattr(dtype, '__name__') else dtype),
        "scales": {},
    }
    for name, tres, jres, res in (("coarse", tc, jc, COARSE), ("up", tu, ju, UP)):
        for s, d in tres.items():
            tflow = d["flow"].permute(0, 2, 3, 1).numpy()
            tcert = d["certainty"].permute(0, 2, 3, 1).numpy()
            jflow = np.asarray(jres[s]["flow"], np.float32)
            jcert = np.asarray(jres[s]["certainty"], np.float32)
            dflow = float(np.abs(jflow - tflow).max())
            p99 = float(np.percentile(np.abs(jflow - tflow), 99))
            report["scales"][f"{name}_s{s}"] = {
                "max_dflow_norm": round(dflow, 6),
                "max_dflow_px": round(dflow * res / 2, 3),
                "p99_dflow_px": round(p99 * res / 2, 4),
                "max_dcert": round(float(np.abs(jcert - tcert).max()), 4),
            }
    out = os.path.join(ROOT, "PARITY_FULLRES.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
