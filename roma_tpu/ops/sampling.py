"""Weighted sampling without replacement + balanced match sampling.

torch.multinomial(replacement=False) has no JAX primitive; the standard
XLA-friendly equivalent is the Gumbel top-k trick: argtop-k of
log(w) + Gumbel noise draws k items without replacement with the same
distribution. Shapes are static (k fixed), so everything jits.

``balanced_sample`` reproduces the reference's ``threshold_balanced`` scheme
(matcher.py:598-629 / tiny.py:234-264): threshold-saturate certainty, draw
4*num candidates, reweight by inverse KDE density, draw num.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .kde import kde


def multinomial_no_replacement(
    key: jax.Array, weights: jnp.ndarray, num: int
) -> jnp.ndarray:
    """Indices of ``num`` draws without replacement, p ∝ weights (>= 0)."""
    g = jax.random.gumbel(key, weights.shape, dtype=jnp.float32)
    scores = jnp.log(weights.astype(jnp.float32)) + g  # w=0 -> -inf, never picked
    _, idx = jax.lax.top_k(scores, num)
    return idx


def balanced_sample(
    key: jax.Array,
    matches: jnp.ndarray,
    certainty: jnp.ndarray,
    num: int,
    thresh: float = 0.05,
    mode: str = "threshold_balanced",
):
    """Sample sparse correspondences from a dense warp.

    Args:
      matches: (N, 4) warp rows (x1, y1, x2, y2) in [-1, 1].
      certainty: (N,) probabilities.
      num: number of matches to return (static).

    Returns (matches (num, 4), certainty (num,)).
    """
    cert = certainty.astype(jnp.float32)
    if "threshold" in mode:
        cert = jnp.where(cert > thresh, 1.0, cert)
    if "balanced" not in mode:
        idx = multinomial_no_replacement(key, cert, num)
        return matches[idx], cert[idx]

    k1, k2 = jax.random.split(key)
    expansion = min(4 * num, cert.shape[0])
    good_idx = multinomial_no_replacement(k1, cert, expansion)
    good_matches = matches[good_idx]
    good_cert = cert[good_idx]
    density = kde(good_matches, std=0.1)
    p = 1.0 / (density + 1.0)
    p = jnp.where(density < 10.0, 1e-7, p)
    bal_idx = multinomial_no_replacement(k2, p, min(num, expansion))
    return good_matches[bal_idx], good_cert[bal_idx]
