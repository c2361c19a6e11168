"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's torch.distributed/NCCL DDP (experiments/train_roma_outdoor.py:170,
232; SURVEY.md §2.6).

RoMa's only parallelism is data parallelism over image pairs; on TPU that is
a 1-D ``data`` mesh over ICI with batch-sharded inputs and replicated params.
Gradient all-reduce is inserted by XLA from the sharding annotations — there
are no explicit collectives in user code, mirroring how DDP hid them.

Multi-host: pass ``jax.distributed.initialize()`` results through
``jax.devices()`` — the same code paths work across slices (DCN) because the
mesh is constructed from the global device list.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a pytree of host arrays with the leading dim sharded over ICI."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
