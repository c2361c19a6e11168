"""Checkpoint / resume (reference romatch/checkpointing/checkpoint.py:10-60).

Orbax-backed: saves {params, batch_stats, opt_state, step} with a rolling
"latest" pointer; process-0-only in multi-host runs; load tolerates missing
optimizer state (the reference swallows partial restores the same way).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckPoint:
    def __init__(self, dir: str, name: str = "model"):
        self.dir = os.path.abspath(dir)
        self.name = name
        os.makedirs(self.dir, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            os.path.join(self.dir, name),
            options=ocp.CheckpointManagerOptions(max_to_keep=2, create=True),
        )

    def save(self, state) -> None:
        if jax.process_index() != 0:
            return
        payload = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "step": np.asarray(state.step),
        }
        self._mngr.save(state.step, args=ocp.args.StandardSave(payload))
        self._mngr.wait_until_finished()

    def load(self, state):
        """Restore the latest checkpoint into ``state`` (in place); returns
        the state. Missing checkpoint or incompatible opt_state is tolerated."""
        latest = self._mngr.latest_step()
        if latest is None:
            return state
        target = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "step": np.asarray(state.step),
        }
        try:
            restored = self._mngr.restore(latest, args=ocp.args.StandardRestore(target))
        except Exception:
            return state
        state.params = restored["params"]
        state.batch_stats = restored["batch_stats"]
        try:
            state.opt_state = restored["opt_state"]
        except Exception:
            pass
        state.step = int(restored["step"])
        return state
