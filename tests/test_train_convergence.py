"""End-to-end training sanity: a few DP train steps on the tiny model with
synthetic identity-pose data must reduce the loss."""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from roma_tpu.models.tiny import TinyRoMaNet
from roma_tpu.parallel.mesh import get_mesh, shard_batch
from roma_tpu.train import (
    TinyRobustLosses,
    init_train_state,
    make_optimizer,
    make_train_step,
)


def test_tiny_training_reduces_loss():
    mesh = get_mesh(8)
    res = 64
    b = 8
    net = TinyRoMaNet(train_mode=True, freeze_xfeat=True, exact_softmax=True)
    dummy = jnp.zeros((1, res, res, 3), jnp.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), dummy, dummy)

    def apply_fn(v, batch):
        corresps, mut = net.apply(
            v, batch["im_A"], batch["im_B"], mutable=["batch_stats"]
        )
        return corresps, mut["batch_stats"]

    objective = TinyRobustLosses(epe_mask_prob_th=0.001)
    optimizer = make_optimizer(
        encoder_lr=0.0, decoder_lr=3e-4, milestones=(10_000,), grad_clip=1.0,
        is_encoder=lambda path, leaf: any(
            getattr(k, "key", None) == "xfeat" for k in path
        ),
    )
    step = make_train_step(apply_fn, objective, optimizer, mesh=mesh)
    state = init_train_state(variables, optimizer, mesh=mesh)

    # identity pose: the same image pair, GT warp == identity
    rs = np.random.RandomState(0)
    im = rs.rand(b, res, res, 3).astype(np.float32)
    K = np.tile(
        np.array([[60.0, 0, res / 2], [0, 60.0, res / 2], [0, 0, 1]], np.float32),
        (b, 1, 1),
    )
    batch = shard_batch(
        {
            "im_A": im,
            "im_B": im,
            "im_A_depth": rs.rand(b, res, res).astype(np.float32) * 5 + 2,
            "im_B_depth": rs.rand(b, res, res).astype(np.float32) * 5 + 2,
            "T_1to2": np.tile(np.eye(4, dtype=np.float32), (b, 1, 1)),
            "K1": K,
            "K2": K,
        },
        mesh,
    )

    losses = []
    for _ in range(6):
        state.params, state.batch_stats, state.opt_state, metrics = step(
            state.params, state.batch_stats, state.opt_state, batch
        )
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
