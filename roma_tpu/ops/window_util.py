"""Shared helpers for the windowed Pallas kernels (lane_warp, tile_window).

``_compact_miss`` turns per-tile out-of-window flags into a fixed number of
slot positions ON the TPU (two matmuls per query chunk) — XLA's sized
``nonzero`` costs ~120 ms at these shapes (measured v5e).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _query_subblock(t: int, cap: int) -> int:
    """Largest divisor of ``t`` <= cap — the kernels iterate t // qs query
    sub-blocks and would silently drop a remainder otherwise."""
    qs = min(t, cap)
    while t % qs:
        qs -= 1
    return qs


def _compact_kernel(miss_ref, tri_ref, o_ref, *, t, kf, qs):
    """Per-tile compaction of miss flags into ``kf`` slot positions.

    The compaction is two matmuls per query chunk: an inclusive cumsum
    against a lower-triangular ones matrix (slot assignment), and a
    slot-one-hot contraction with the query-index vector (slot -> query).
    Unfilled slots read the sentinel ``t``.
    """
    nq = t // qs
    carry = jnp.zeros((1, 1), jnp.float32)
    pos = jnp.zeros((kf, 1), jnp.float32)
    found = jnp.zeros((kf, 1), jnp.float32)
    ki = jax.lax.broadcasted_iota(jnp.int32, (kf, qs), 0).astype(jnp.float32)
    for qb in range(nq):
        m = miss_ref[0, :, pl.ds(qb * qs, qs)].astype(jnp.float32)  # (1, qs)
        s = jax.lax.dot_general(
            m, tri_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + carry  # (1, qs) inclusive counts
        oh = jnp.where((s == ki + 1.0) & (m > 0), 1.0, 0.0)  # (kf, qs)
        qi = (
            jax.lax.broadcasted_iota(jnp.int32, (qs, 1), 0) + qb * qs
        ).astype(jnp.float32)
        pos = pos + jax.lax.dot_general(
            oh, qi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        found = found + jnp.sum(oh, axis=1, keepdims=True)
        carry = carry + jnp.sum(m, axis=1, keepdims=True)
    o_ref[0] = (pos + (1.0 - found) * t).astype(jnp.int32)


def _compact_miss(miss, t, kf, interpret=False):
    """(bnt, 1, T) bool -> (bnt, KF, 1) int32 miss positions (sentinel T)."""
    bnt = miss.shape[0]
    qs = _query_subblock(t, 1024)
    ii = jnp.arange(qs, dtype=jnp.int32)
    tri = (ii[:, None] >= ii[None, :]).astype(jnp.float32)  # L[q, q'] = q' <= q
    return pl.pallas_call(
        functools.partial(_compact_kernel, t=t, kf=kf, qs=qs),
        grid=(bnt,),
        in_specs=[
            pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qs, qs), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kf, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bnt, kf, 1), jnp.int32),
        interpret=interpret,
    )(miss, tri)
