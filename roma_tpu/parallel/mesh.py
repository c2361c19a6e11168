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
    """Place a pytree of host arrays with the leading dim sharded over ICI.

    Single-process: a plain ``device_put``. Multi-process (``jax.distributed``
    initialized, mesh spanning non-addressable devices): each process passes
    the identical GLOBAL batch and contributes only the shards its devices
    own via ``make_array_from_callback`` — the multi-controller analog of
    DDP's "every rank sees the same global step, holds its slice".
    """
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_callback(
                np.shape(x), sharding, lambda idx, x=x: np.asarray(x)[idx]
            ),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_callback(
                np.shape(x), sharding, lambda idx, x=x: np.asarray(x)[idx]
            ),
            tree,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
