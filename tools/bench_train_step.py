"""Single-chip train-step wall clock for the big-RoMa recipe (real TPU).

First on-silicon training number: the full RoMaNet fwd+bwd+AdamW step at
the reference recipe's medium resolution (560x560, train_roma_outdoor
recipe — reference experiments/roma_outdoor.py: bs8/GPU on A100-80GB).
v5e has 16 GB HBM, so the per-chip batch is probed downward from 8 until
the step fits; pairs/s/chip = bs / step-time either way (DP scales this
linearly across a mesh — the AOT_MULTICHIP.json artifact pins that the
8-device shard_map program compiles at these dims).

nohup python tools/bench_train_step.py > /tmp/bts.log 2>&1 &
"""
from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ROMA_TPU_OFFLINE", "1")

import jax
import jax.numpy as jnp
import numpy as np


def make_batch(b, h, w, seed=0):
    rs = np.random.RandomState(seed)
    K = np.tile(
        np.array([[300.0, 0, w / 2], [0, 300.0, h / 2], [0, 0, 1]], np.float32),
        (b, 1, 1),
    )
    T = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    T[:, 0, 3] = 0.1
    return {
        "im_A": jnp.asarray(rs.rand(b, h, w, 3), jnp.float32),
        "im_B": jnp.asarray(rs.rand(b, h, w, 3), jnp.float32),
        "im_A_depth": jnp.asarray(rs.rand(b, h, w) * 5 + 2, jnp.float32),
        "im_B_depth": jnp.asarray(rs.rand(b, h, w) * 5 + 2, jnp.float32),
        "T_1to2": jnp.asarray(T),
        "K1": jnp.asarray(K),
        "K2": jnp.asarray(K),
    }


def main():
    from roma_tpu.models.matcher import RoMaNet
    from roma_tpu.train import (
        RobustLosses,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    print(f"backend={jax.default_backend()}", flush=True)
    h = w = int(os.environ.get("ROMA_BENCH_RES", "560"))  # CPU dry-run: 56
    remat = os.environ.get("ROMA_BENCH_REMAT", "1") == "1"
    net = RoMaNet(dtype=jnp.bfloat16, train_mode=True, remat=remat)
    print(f"  remat={remat}", flush=True)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 56, 56, 3), jnp.float32)
    variables = jax.jit(net.init)(rng, dummy, dummy)

    objective = RobustLosses(
        ce_weight=0.01,
        local_dist=((1, 4.0), (2, 4.0), (4, 8.0), (8, 8.0)),
        local_largest_scale=8,
        alpha=0.5,
        c=1e-4,
    )
    optimizer = make_optimizer(
        encoder_lr=8 * 5e-6 / 8,
        decoder_lr=8 * 1e-4 / 8,
        milestones=(900_000,),
        grad_clip=0.01,
        warmup_steps=100,
    )

    def apply_fn(v, batch):
        corresps, mut = net.apply(
            v, batch["im_A"], batch["im_B"], mutable=["batch_stats"]
        )
        return corresps, mut["batch_stats"]

    step = make_train_step(apply_fn, objective, optimizer)
    state = init_train_state(variables, optimizer)

    bss = tuple(
        int(b) for b in os.environ.get("ROMA_BENCH_BS", "8,4,2").split(",")
    )
    for bs in bss:
        try:
            batch = make_batch(bs, h, w)
            t_c = time.perf_counter()
            p, s_, o, m = step(state.params, state.batch_stats, state.opt_state, batch)
            loss0 = float(m["loss"])
            print(
                f"  bs{bs}: compile+1st step {time.perf_counter()-t_c:.0f}s "
                f"loss={loss0:.4f} nonfinite={float(m['nonfinite_grads']):.0f}",
                flush=True,
            )
            iters = 5
            t0 = time.perf_counter()
            for _ in range(iters):
                p, s_, o, m = step(p, s_, o, batch)
                lv = float(m["loss"])  # tunnel completion barrier
            dt = (time.perf_counter() - t0) / iters
            print(
                f"  train {h}^2 bs{bs}: {dt*1e3:.1f} ms/step = "
                f"{bs/dt:.3f} pairs/s/chip (loss {loss0:.4f} -> {lv:.4f})",
                flush=True,
            )
            break
        except Exception:
            traceback.print_exc()
            print(f"  bs{bs} failed; trying smaller", flush=True)


if __name__ == "__main__":
    main()
