"""Rematerialized training path == plain path (grads, outputs, BN stats).

``RoMaNet(remat=True)`` wraps VGG19 and each ConvRefiner in nn.remat
(class-level, so the name scopes and converter mapping are unchanged);
jax.checkpoint must only trade compute for memory, never change a value.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roma_tpu.models.config import RoMaConfig
from roma_tpu.models.matcher import RoMaNet


def _loss(net, variables, im_A, im_B):
    corresps, mut = net.apply(
        variables, im_A, im_B, mutable=["batch_stats"]
    )
    loss = sum(
        jnp.sum(jnp.abs(v.astype(jnp.float32)))
        for scale in corresps.values()
        for v in scale.values()
    )
    return loss, mut["batch_stats"]


def test_remat_matches_plain():
    cfg = RoMaConfig.tiny()
    rs = np.random.RandomState(0)
    im_A = jnp.asarray(rs.rand(2, 56, 56, 3), jnp.float32)
    im_B = jnp.asarray(rs.rand(2, 56, 56, 3), jnp.float32)

    nets = {
        flag: RoMaNet(config=cfg, train_mode=True, remat=flag)
        for flag in (False, True)
    }
    variables = jax.jit(nets[False].init)(jax.random.PRNGKey(0), im_A, im_B)
    # identical param trees: remat wraps classes, not name scopes
    v2 = jax.jit(nets[True].init)(jax.random.PRNGKey(0), im_A, im_B)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)

    out = {}
    for flag, net in nets.items():
        grad_fn = jax.jit(
            jax.value_and_grad(
                lambda p: _loss(
                    net, {"params": p, "batch_stats": variables["batch_stats"]},
                    im_A, im_B,
                ),
                has_aux=True,
            )
        )
        (loss, stats), grads = grad_fn(variables["params"])
        out[flag] = (float(loss), grads, stats)

    assert np.isclose(out[True][0], out[False][0], rtol=1e-6)
    # remat re-fuses the recomputed forward, so grads carry float
    # reassociation noise (measured rel ~2e-4 on the attention qkv
    # kernel). atol is scale-aware — 1e-5 of the largest grad magnitude —
    # because exact-cancellation leaves (a conv bias directly followed by
    # BN: the mean subtraction cancels it) have true grad ~0 and carry
    # catastrophic-cancellation noise proportional to the loss scale on
    # BOTH sides. A real remat bug (double BN update, wrong recompute)
    # shows up as order-1 relative error on large-magnitude grads, which
    # rtol still catches.
    leaves_a = jax.tree_util.tree_flatten_with_path(out[False][1])[0]
    leaves_b = jax.tree_util.tree_flatten_with_path(out[True][1])[0]
    gmax = max(float(np.abs(np.asarray(a)).max()) for _, a in leaves_a)
    for (pa, a), (pb, b) in zip(leaves_a, leaves_b):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5 * gmax, rtol=2e-3,
            err_msg=jax.tree_util.keystr(pa),
        )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(out[False][2])[0],
        jax.tree_util.tree_flatten_with_path(out[True][2])[0],
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6,
            err_msg=jax.tree_util.keystr(pa),
        )
