"""Full-resolution (560^2 coarse -> 864^2 upsample) numerics pin.

Two questions, answered separately (VERDICT r2 item 4):

1. **Machinery parity** — do the full-res-only code paths (bicubic
   pos-embed interpolation at 40x40 / 62x62 grids, GP Cholesky at
   1225x1225, big grid_sample/local-corr shapes) match the torch spec?
   Answered by torch-CPU f32 vs JAX f32: expect tiny deltas.
2. **bf16 drift** — what does the production bf16 pipeline change?
   Answered by JAX bf16 vs JAX f32 on the same backend. At the coarse
   scales the 64^2 anchor classification argmax can flip under tiny logit
   jitter (with random weights nearly every cell is a tie), so the
   meaningful numbers are the flip rate and the delta distribution, not
   the max.

Writes PARITY_FULLRES.json. Run detached:
  nohup python tools/fullres_parity.py > /tmp/fp.log 2>&1 &
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


def flow_stats(a, b, res):
    """a, b: (B, H, W, 2) normalized flows."""
    d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
    dpx = d * res / 2
    return {
        "max_px": round(float(dpx.max()), 4),
        "p99_px": round(float(np.percentile(dpx, 99)), 4),
        "p50_px": round(float(np.percentile(dpx, 50)), 5),
    }


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else "all"
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
    im_A_u = (rng.randn(1, UP, UP, 3) * 0.5).astype(np.float32)
    im_B_u = (rng.randn(1, UP, UP, 3) * 0.5).astype(np.float32)

    sf_c = 1.0
    sf_u = math.sqrt(UP * UP / (COARSE * COARSE))

    cache = "/tmp/fullres_torch.npz"
    if phase == "jax" and os.path.exists(cache):
        z = np.load(cache)
        tc = {int(k[2:]): {"flow": torch.tensor(z[k]), "certainty": torch.tensor(z["cc" + k[2:]])} for k in z.files if k.startswith("tf")}
        tu = {int(k[2:]): {"flow": torch.tensor(z[k]), "certainty": torch.tensor(z["cu" + k[2:]])} for k in z.files if k.startswith("uf")}
        tc = {s_: {"flow": tc[s_]["flow"], "certainty": tc[s_]["certainty"]} for s_ in tc}
    else:
        tc = tu = None
    t0 = time.time()
    if tc is None:
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
      np.savez(
          cache,
          **{f"tf{s_}": d["flow"].numpy() for s_, d in tc.items()},
          **{f"cc{s_}": d["certainty"].numpy() for s_, d in tc.items()},
          **{f"uf{s_}": d["flow"].numpy() for s_, d in tu.items()},
          **{f"cu{s_}": d["certainty"].numpy() for s_, d in tu.items()},
      )
    if phase == "torch":
        print("torch phase cached; run with 'jax' to finish")
        return

    import jax
    import jax.numpy as jnp

    from roma_tpu.models.matcher import RoMaNet
    from roma_tpu.models.zoo import convert

    variables = convert.convert_roma(roma_sd, dinov2_sd)
    seed_flow = jnp.asarray(tc[1]["flow"].permute(0, 2, 3, 1).numpy())
    seed_cert = jnp.asarray(tc[1]["certainty"].permute(0, 2, 3, 1).numpy())

    def run_jax(dtype):
        net = RoMaNet(dtype=dtype, coarse_dtype=dtype)
        t = time.time()
        jc = jax.jit(
            lambda v, a, b: net.apply(v, a, b, symmetric=True, scale_factor=sf_c)
        )(variables, jnp.asarray(im_A), jnp.asarray(im_B))
        jc = jax.tree.map(np.asarray, jc)
        print(f"jax {dtype.__name__} coarse done in {time.time()-t:.0f}s", flush=True)
        t = time.time()
        ju = jax.jit(
            lambda v, a, b, f, c: net.apply(
                v, a, b, symmetric=True, upsample=True, flow=f, certainty=c,
                scale_factor=sf_u,
            )
        )(variables, jnp.asarray(im_A_u), jnp.asarray(im_B_u), seed_flow, seed_cert)
        ju = jax.tree.map(np.asarray, ju)
        print(f"jax {dtype.__name__} upsample done in {time.time()-t:.0f}s", flush=True)
        return jc, ju

    jc32, ju32 = run_jax(jnp.float32)
    jc16, ju16 = run_jax(jnp.bfloat16)

    report = {
        "config": f"{COARSE}->{UP} symmetric b=1, random converted weights",
        "jax_backend": jax.default_backend(),
        "f32_vs_torch": {},
        "bf16_vs_f32": {},
    }
    for name, tres, jres, res in (("coarse", tc, jc32, COARSE), ("up", tu, ju32, UP)):
        for s, d in tres.items():
            tflow = d["flow"].permute(0, 2, 3, 1).numpy()
            tcert = d["certainty"].permute(0, 2, 3, 1).numpy()
            st = flow_stats(jres[s]["flow"], tflow, res)
            st["max_dcert"] = round(
                float(np.abs(np.asarray(jres[s]["certainty"], np.float32) - tcert).max()), 4
            )
            report["f32_vs_torch"][f"{name}_s{s}"] = st
    cell_px = COARSE / 64  # one coarse anchor cell
    for name, j32, j16, res in (("coarse", jc32, jc16, COARSE), ("up", ju32, ju16, UP)):
        for s in j32:
            st = flow_stats(j16[s]["flow"], j32[s]["flow"], res)
            d = np.abs(
                np.asarray(j16[s]["flow"], np.float32)
                - np.asarray(j32[s]["flow"], np.float32)
            ) * res / 2
            st["anchor_flip_rate"] = round(float((d.max(-1) > cell_px).mean()), 4)
            report["bf16_vs_f32"][f"{name}_s{s}"] = st
    out = os.path.join(ROOT, "PARITY_FULLRES.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
