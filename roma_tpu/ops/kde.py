"""Gaussian KDE over match samples (reference romatch/utils/kde.py:4-13).

density_i = sum_j exp(-||x_i - x_j||^2 / (2 std^2))

The reference materializes the full N x N cdist; here the pairwise term is a
chunked MXU matmul (||a||^2 + ||b||^2 - 2 a.b) scanned over row blocks so HBM
stays bounded for N ~ tens of thousands.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def kde(x: jnp.ndarray, std: float = 0.1, chunk: int = 4096) -> jnp.ndarray:
    """x: (N, D) samples -> (N,) density (float32)."""
    n, d = x.shape
    xf = x.astype(jnp.float32)
    sq = jnp.sum(xf * xf, axis=-1)  # (N,)
    inv2s2 = 1.0 / (2.0 * std * std)

    pad = (-n) % chunk
    xp = jnp.pad(xf, ((0, pad), (0, 0)))
    sqp = jnp.pad(sq, (0, pad), constant_values=jnp.inf)  # padded rows -> exp(-inf)=0 contributions handled below
    rows = xp.reshape(-1, chunk, d)
    row_sq = sqp.reshape(-1, chunk)

    def block(carry, inp):
        rx, rsq = inp
        # (chunk, N) squared distances via matmul
        dots = jnp.einsum(
            "cd,nd->cn",
            rx,
            xf,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # D=4: full precision is free
        )
        d2 = rsq[:, None] + sq[None, :] - 2.0 * dots
        dens = jnp.sum(jnp.exp(-jnp.maximum(d2, 0.0) * inv2s2), axis=-1)
        return carry, dens

    _, dens = jax.lax.scan(block, None, (rows, row_sq))
    return dens.reshape(-1)[:n]
