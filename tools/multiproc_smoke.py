"""2-process jax.distributed smoke (VERDICT r3 item 5).

The reference's multi-process path is torchrun DDP
(/root/reference/experiments/train_roma_outdoor.py:170-178). The TPU-native
equivalent is multi-controller JAX: ``jax.distributed.initialize`` + the same
1-D data mesh built from the GLOBAL device list — no other code changes,
because the mesh helpers (parallel/mesh.py) switch to
``make_array_from_callback`` when ``jax.process_count() > 1``.

This tool runs the full ``__graft_entry__.dryrun_multichip(8)`` train step as
2 processes x 4 virtual CPU devices and asserts:
  * both processes execute one step and report the SAME loss;
  * the loss matches a fresh single-process 8-device run bit-for-bit
    (identical global batch, shardings, and per-device program);
  * the per-host DataLoader index slices are disjoint and complete;
  * process-0 gating: only process 0 reports itself the writer.

Writes MULTIPROC_r04.json at the repo root.

  python tools/multiproc_smoke.py            # parent: spawns everything
  python tools/multiproc_smoke.py --proc I   # child (internal)
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

NPROCS = 2
DEVS_PER_PROC = 4
PORT = 51427


def child(proc_id: int):
    import jax

    # the image's site hook force-registers the tunneled TPU platform; claim
    # CPU before any backend init (env vars are too late — see verify skill)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", DEVS_PER_PROC)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=NPROCS,
        process_id=proc_id,
    )
    assert jax.process_count() == NPROCS
    assert len(jax.devices()) == NPROCS * DEVS_PER_PROC
    assert len(jax.local_devices()) == DEVS_PER_PROC

    # per-host loader slice: disjoint + complete over the index stream
    from roma_tpu.datasets.loader import DataLoader

    class _Empty:
        def __getitem__(self, i):
            raise AssertionError("not used")

    idx = list(range(64))
    mine = DataLoader(
        _Empty(), idx, batch_size=4,
        process_index=jax.process_index(), process_count=jax.process_count(),
    ).indices
    print(f"loader_slice proc{proc_id}: {sorted(mine.tolist())}", flush=True)

    # process-0 gating (the reference's rank-0 checkpoint/wandb gate)
    print(f"is_writer proc{proc_id}: {jax.process_index() == 0}", flush=True)

    import __graft_entry__

    __graft_entry__.dryrun_multichip(NPROCS * DEVS_PER_PROC)


def parent():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--proc", str(i)],
            cwd=ROOT, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(NPROCS)
    ]
    outs = [p.communicate(timeout=1800)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        print(f"--- proc {i} (rc={p.returncode}) ---\n{out}")
        assert p.returncode == 0, f"proc {i} failed"

    losses = [
        re.search(r"ok: loss=([0-9.]+)", out).group(1) for out in outs
    ]
    assert losses[0] == losses[1], f"cross-process loss mismatch: {losses}"

    slices = [
        set(json.loads(re.search(r"loader_slice proc\d+: (\[.*\])", out).group(1)))
        for out in outs
    ]
    assert not (slices[0] & slices[1]), "loader slices overlap"
    assert slices[0] | slices[1] == set(range(64)), "loader slices incomplete"

    writers = [re.search(r"is_writer proc\d+: (\w+)", out).group(1) for out in outs]
    assert writers == ["True", "False"], writers

    # single-process 8-device reference run (same batch, same program)
    single = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__; __graft_entry__.dryrun_multichip(8)",
        ],
        cwd=ROOT,
        # device count must be fixed before backend init (dryrun_multichip
        # can only update jax_num_cpu_devices pre-first-jax-op)
        env={
            **env,
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8",
        },
        capture_output=True, text=True, timeout=1800,
    )
    print(single.stdout)
    assert single.returncode == 0, single.stdout + single.stderr
    sloss = re.search(r"ok: loss=([0-9.]+)", single.stdout).group(1)
    assert sloss == losses[0], f"2-proc {losses[0]} != 1-proc {sloss}"

    report = {
        "config": f"{NPROCS} processes x {DEVS_PER_PROC} cpu devices, "
        "dryrun_multichip(8) train step",
        "loss_2proc": float(losses[0]),
        "loss_1proc_8dev": float(sloss),
        "loader_slices_disjoint_complete": True,
        "process0_writer_gating": True,
        "ok": True,
    }
    with open(os.path.join(ROOT, "MULTIPROC_r04.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    if "--proc" in sys.argv:
        child(int(sys.argv[sys.argv.index("--proc") + 1]))
    else:
        parent()
