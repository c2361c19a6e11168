"""AOT-compile the FULL-DIMS 8-device shard_map train step against a TPU
topology (VERDICT r2 item 5).

``__graft_entry__.dryrun_multichip`` executes the structurally-complete
tiny config on a virtual CPU mesh (full dims time out on XLA:CPU); this
tool proves the *released-dims* multi-chip program builds: it lowers the
shard_map training step for an 8-device v5e:2x4 mesh at RoMaConfig()
dimensions (560^2, batch 8 = 1 pair/device) and compiles it AOT — no
8-chip hardware needed, abstract topology devices + ShapeDtypeStruct
arguments. Writes AOT_MULTICHIP.json with compile time + memory analysis.

Run detached: nohup python tools/aot_multichip_compile.py > /tmp/aot.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np

N_DEV = 8
RES = 560
BATCH = 8  # one pair per device


def sds_tree(tree):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)), tree
    )


def main():
    from jax.experimental import topologies
    from jax.sharding import Mesh

    from roma_tpu.models.config import RoMaConfig
    from roma_tpu.models.matcher import RoMaNet
    from roma_tpu.train import RobustLosses, make_optimizer, make_train_step
    from roma_tpu.utils.fast_init import shape_init

    topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    devices = list(topo.devices)
    print(f"AOT topology devices: {len(devices)}", flush=True)
    mesh = Mesh(np.asarray(devices).reshape(N_DEV), ("data",))

    net = RoMaNet(config=RoMaConfig(), train_mode=True)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, RES, RES, 3), jnp.float32)
    variables = shape_init(net.init, rng, dummy, dummy)

    def apply_fn(variables, batch):
        corresps, mut = net.apply(
            variables, batch["im_A"], batch["im_B"], mutable=["batch_stats"]
        )
        return corresps, mut["batch_stats"]

    objective = RobustLosses()
    optimizer = make_optimizer(encoder_lr=5e-6, decoder_lr=1e-4, milestones=(1000,))
    step = make_train_step(apply_fn, objective, optimizer, mesh=mesh)

    params_s = sds_tree(variables["params"])
    stats_s = sds_tree(variables["batch_stats"])
    opt_s = sds_tree(jax.eval_shape(optimizer.init, params_s))
    batch_s = {
        "im_A": jax.ShapeDtypeStruct((BATCH, RES, RES, 3), jnp.float32),
        "im_B": jax.ShapeDtypeStruct((BATCH, RES, RES, 3), jnp.float32),
        "im_A_depth": jax.ShapeDtypeStruct((BATCH, RES, RES), jnp.float32),
        "im_B_depth": jax.ShapeDtypeStruct((BATCH, RES, RES), jnp.float32),
        "T_1to2": jax.ShapeDtypeStruct((BATCH, 4, 4), jnp.float32),
        "K1": jax.ShapeDtypeStruct((BATCH, 3, 3), jnp.float32),
        "K2": jax.ShapeDtypeStruct((BATCH, 3, 3), jnp.float32),
    }

    t0 = time.time()
    lowered = step.lower(params_s, stats_s, opt_s, batch_s)
    t_lower = time.time() - t0
    print(f"lowered in {t_lower:.0f}s", flush=True)

    t1 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t1
    print(f"compiled in {t_compile:.0f}s", flush=True)

    try:
        mem = compiled.memory_analysis()
        mem_d = {
            k: int(getattr(mem, k))
            for k in (
                "temp_size_in_bytes",
                "argument_size_in_bytes",
                "output_size_in_bytes",
                "generated_code_size_in_bytes",
            )
            if hasattr(mem, k)
        }
    except Exception as e:  # noqa: BLE001
        mem_d = {"error": str(e)[:200]}
    try:
        ca = compiled.cost_analysis()
        flops = ca.get("flops") if isinstance(ca, dict) else getattr(ca, "flops", None)
    except Exception:  # noqa: BLE001
        flops = None

    report = {
        "ok": True,
        "config": (
            f"RoMaConfig() full dims, res {RES}, batch {BATCH} over "
            f"{N_DEV}-device v5e:2x4 mesh (shard_map train step)"
        ),
        "lower_s": round(t_lower, 1),
        "compile_s": round(t_compile, 1),
        "memory_analysis": mem_d,
        "flops": flops,
    }
    with open(os.path.join(ROOT, "AOT_MULTICHIP.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
