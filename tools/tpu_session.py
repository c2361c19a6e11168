"""One serialized TPU session running every pending measurement — the
tunnel wedges when clients are killed or run concurrently, so steps run
strictly sequentially. Each step now runs in its OWN subprocess
(``--step NAME`` re-entry): an OOM mid-step used to leave the shared
process's HBM wedged and cascade RESOURCE_EXHAUSTED into every later
step (observed after a bs8 train-step retry). Safe to re-run; each step
is independent.

nohup python tools/tpu_session.py > /tmp/ts.log 2>&1 &
python tools/tpu_session.py --step int8-matmul-probe   # one step only
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))
os.environ.setdefault("ROMA_TPU_OFFLINE", "1")  # hermetic benches

import jax
import jax.numpy as jnp
import numpy as np


def step(name):
    def deco(fn):
        STEPS.append((name, fn))
        return fn

    return deco


STEPS = []


# ------------------------------------------------------------------ 1
@step("profile-dinov2-packed")
def pdv():
    # packed-attention A/B: single Block / 24-block stack now route the
    # packed kernel; the sdpa line still times the per-head kernel.
    import profile_dinov2

    profile_dinov2.main()


# ------------------------------------------------------------------ 2
@step("bench-e2e-560-864")
def bench_e2e():
    sys.path.insert(0, ROOT)
    import bench

    bench.main()


# ------------------------------------------------------------------ 3
@step("bench-1344")
def bench_golden():
    import bench_1344

    bench_1344.main()


# ------------------------------------------------------------------ 4
@step("train-step-bs8-retry")
def train_bs8():
    # GP + TransformerDecoder now remat under the same flag — retry bs8
    # (runtime alloc was just over 15.75 G before; ~0.5 G of GP f32
    # intermediates plus TD concat/head residuals were the margin).
    os.environ["ROMA_BENCH_BS"] = "8,6"
    import bench_train_step

    bench_train_step.main()


# ------------------------------------------------------------------ 5
@step("int8-matmul-probe")
def int8_probe():
    # Is XLA's int8 dot fast on this stack? ViT-L block shapes, bf16 vs
    # int8xint8->int32 (the AQT-style dynamic-quant primitive). Decides
    # whether an opt-in quantized frozen-DINOv2 path is worth building
    # (v5e int8 MXU peak is 2x bf16).
    import time

    import numpy as np

    rs = np.random.RandomState(0)
    m, reps = 16 * 1664, 40
    for k, n in ((1024, 3072), (1024, 4096), (4096, 1024), (1024, 1024)):
        xb = jnp.asarray(rs.randn(m, k), jnp.bfloat16)
        wb = jnp.asarray(rs.randn(k, n), jnp.bfloat16)
        xq = jnp.asarray(rs.randint(-127, 128, (m, k)), jnp.int8)
        wq = jnp.asarray(rs.randint(-127, 128, (k, n)), jnp.int8)

        @jax.jit
        def f_bf16(a, b):
            return jax.lax.dot(a, b, preferred_element_type=jnp.float32)

        @jax.jit
        def f_int8(a, b):
            return jax.lax.dot(a, b, preferred_element_type=jnp.int32)

        for name, f, a, b_ in (("bf16", f_bf16, xb, wb), ("int8", f_int8, xq, wq)):
            try:
                float(jnp.sum(f(a, b_)[0]))  # compile + barrier
                t0 = time.perf_counter()
                for _ in range(reps):
                    o = f(a, b_)
                float(jnp.sum(o[0]))
                dt = (time.perf_counter() - t0) / reps
                tflops = 2 * m * k * n / dt / 1e12
                print(f"  ({m},{k})@({k},{n}) {name}: {dt*1e3:7.2f} ms "
                      f"{tflops:6.1f} T", flush=True)
            except Exception as e:
                print(f"  ({m},{k})@({k},{n}) {name}: FAILED {type(e).__name__} {e}",
                      flush=True)


# ------------------------------------------------------------------ 6
@step("int8-e2e")
def int8_e2e():
    # roma_outdoor int8 serving knobs, 560->864 bs8, vs the step-2
    # baseline. Only meaningful if the int8-matmul-probe shows XLA int8
    # dots beating bf16; the numbers stand either way.
    import time

    import numpy as np

    from roma_tpu.models.zoo import roma_outdoor

    import bench as bench_mod

    rs = np.random.RandomState(0)
    # Silicon history (v5e, bs8 560->864): pre-qkv-gating run measured
    # gelu_tanh 4.984 / vit_int8 4.975 / vit+refiner_int8 3.894 /
    # all_knobs 3.951 pairs/s — refiner_int8 is a clear LOSS (the 1x1
    # convs at refiner shapes don't amortize the quant passes) and
    # vit_int8 was a wash with qkv still routed (probe: int8 qkv
    # 61 vs bf16 100 TFLOP/s). Current list re-measures with qkv gated.
    for tag, kw in (
        ("baseline", dict()),
        ("vit_int8", dict(vit_int8=True)),
    ):
        model = roma_outdoor(coarse_res=560, upsample_res=864, amp=True, **kw)
        bench_mod.smooth_coarse_warp(model)
        ims = [
            jnp.asarray(rs.randn(8, r, r, 3), model.dtype)
            for r in (560, 560, 864, 864)
        ]

        def run():
            warp, cert = model.match(
                ims[0], ims[1], im_A_high_res=ims[2], im_B_high_res=ims[3]
            )
            return float(jnp.sum(cert))

        run()
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            run()
        dt = (time.perf_counter() - t0) / iters
        print(f"  {tag} e2e 560->864 bs8: {dt*1e3:.0f} ms/batch "
              f"= {8/dt:.3f} pairs/s/chip", flush=True)


# ------------------------------------------------------------------ 7
@step("cmajor-packed-bench")
def cmajor_packed_bench():
    # packed (channel-chunk whole-tensor) vs per-channel cmajor kernel at
    # the scale-1 refiner shapes (C=24, 9 folded blocks, g=3 chunking).
    import time

    import numpy as np

    from roma_tpu.ops import pallas_refiner as pr

    rs = np.random.RandomState(0)
    for hw in (560, 864):
        c = 24
        x = jnp.asarray(rs.randn(16, hw, hw, c), jnp.bfloat16)
        blocks = [
            dict(
                dw=jnp.asarray(rs.randn(5, 5, c), jnp.float32) * 0.2,
                db=jnp.asarray(rs.randn(c), jnp.float32) * 0.1,
                w2=jnp.asarray(rs.randn(c, c), jnp.float32) / np.sqrt(c),
                b2=jnp.asarray(rs.randn(c), jnp.float32) * 0.1,
            )
            for _ in range(9)
        ]

        def run_old(x):
            y = x
            for i in range(0, 9, 3):
                y = pr._fused_cmajor(y, blocks[i : i + 3], s_rows=40)
            return y

        def make_packed(s_rows, cg):
            def run(x):
                y = x
                for i in range(0, 9, 3):
                    y = pr._fused_cmajor_packed(
                        y, blocks[i : i + 3], s_rows=s_rows, cg=cg
                    )
                return y
            return run

        fns = [("old s40", jax.jit(run_old))]
        for s_rows in (16, 24, 32):
            for cg in (8, 24):
                fns.append(
                    (f"packed s{s_rows} cg{cg}", jax.jit(make_packed(s_rows, cg)))
                )
        ref = None
        for name, f in fns:
            try:
                o = f(x)
                float(jnp.sum(o))
                if ref is None:
                    ref = o
                else:
                    d = float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref.astype(jnp.float32))))
                    assert d < 1e-2, (name, d)
                t0 = time.perf_counter()
                for _ in range(10):
                    o = f(x)
                float(jnp.sum(o))
                dt = (time.perf_counter() - t0) / 10
                print(f"  {hw}^2 C=24 9blk {name}: {dt*1e3:7.2f} ms", flush=True)
            except Exception as e:
                print(f"  {hw}^2 C=24 9blk {name}: FAILED {type(e).__name__}: {e}",
                      flush=True)


@step("serving-engine-throughput")
def serving_engine():
    # End-to-end pair-stream throughput THROUGH MatchEngine (real JPEG
    # decode + resize on host, prefetch-overlapped) vs the device-only
    # bench numbers. Always builds the production (no-knobs) model.
    import time

    from roma_tpu.serving import MatchEngine

    from roma_tpu.models.zoo import roma_outdoor

    model = roma_outdoor(coarse_res=560, upsample_res=864, amp=True)
    A = "/root/reference/assets/sacre_coeur_A.jpg"
    B = "/root/reference/assets/sacre_coeur_B.jpg"
    pairs = [(A, B), (B, A)] * 16  # 32 pairs = 4 batches of 8
    engine = MatchEngine(model, batch_size=8, prefetch=2, workers=8)
    # warm (compile check with real images) then timed pass
    for r in engine.match_paths(pairs[:8]):
        pass
    t0 = time.perf_counter()
    n = 0
    for r in engine.match_paths(pairs):
        c = float(jnp.sum(r.certainty))  # completion barrier per pair slice
        n += 1
    dt = time.perf_counter() - t0
    print(f"  MatchEngine 560->864 bs8, {n} pairs w/ JPEG decode: "
          f"{n/dt:.3f} pairs/s/chip", flush=True)


def run_step(name):
    fn = dict(STEPS)[name]
    print(f"backend={jax.default_backend()}", flush=True)
    fn()


def main(only=None):
    known = {n for n, _ in STEPS}
    if only is not None:
        unknown = set(only) - known
        if unknown:
            sys.exit(
                f"unknown step(s): {sorted(unknown)}; "
                f"available: {sorted(known)}"
            )
    names = [n for n, _ in STEPS if only is None or n in only]
    for name in names:
        print(f"== {name} ==", flush=True)
        t0 = time.time()
        # per-step subprocess: a wedged/fragmented HBM dies with the step
        rc = subprocess.call(
            [sys.executable, os.path.abspath(__file__), "--step", name],
            cwd=ROOT,
        )
        status = "done" if rc == 0 else f"FAILED rc={rc}"
        print(f"== {name} {status} in {time.time()-t0:.0f}s ==", flush=True)


if __name__ == "__main__":
    if sys.argv[1:2] == ["--step"]:
        if len(sys.argv) < 3:
            sys.exit("usage: tpu_session.py --step NAME")
        try:
            run_step(sys.argv[2])
        except Exception:
            traceback.print_exc()
            sys.exit(1)
    else:
        main(only=set(sys.argv[1:]) or None)
