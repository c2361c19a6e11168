"""Shape-only variable initialization.

``jax.jit(net.init)`` compiles the full forward graph just to produce
initial parameter values — on XLA:CPU that costs minutes for big models.
``shape_init`` instead traces shapes with ``jax.eval_shape`` (no compile)
and fills the leaves host-side with sensible defaults:

  * BatchNorm running ``var`` / affine ``scale`` / LayerScale ``gamma`` -> 1,
  * running ``mean`` / ``bias`` -> 0,
  * everything else (conv/dense kernels, tokens, embeddings) -> N(0, scale²),
    deterministic per leaf.

Intended for smoke tests, dryruns, and benchmarks where the variables only
need the right structure and finite, well-conditioned values — real training
uses the module's own initializers, and real inference uses converted weights.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_ONES = ("var", "scale", "gamma")
_ZEROS = ("mean", "bias")


def shape_init(init_fn, rng, *args, scale: float = 0.02, **kwargs):
    """Build a variables pytree matching ``init_fn(rng, *args)`` by shape."""
    shapes = jax.eval_shape(init_fn, rng, *args, **kwargs)
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    leaves = []
    for i, (path, leaf) in enumerate(flat):
        names = [str(getattr(k, "key", k)) for k in path]
        last = names[-1] if names else ""
        if last in _ONES:
            val = np.ones(leaf.shape, "float32")
        elif last in _ZEROS:
            val = np.zeros(leaf.shape, "float32")
        else:
            # f32 generation directly — no f64 intermediate (matters at 400M params)
            val = scale * np.random.default_rng(i).standard_normal(
                leaf.shape, dtype="float32"
            )
        leaves.append(jnp.asarray(val, leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
