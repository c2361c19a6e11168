"""Optimizer recipe (reference experiments/train_roma_outdoor.py:194-251):
AdamW wd=0.01 with per-group LRs (encoder vs decoder), MultiStepLR decay 0.2
at 90% of training, global grad-norm clip 0.01.

No GradScaler: bf16 has f32-range exponents, so the reference's fp16 loss
scaling (train/train.py:27-35) has no TPU equivalent to port.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import optax


def multistep_lr(
    base_lr: float,
    milestones: tuple[int, ...],
    gamma: float = 0.2,
    warmup_steps: int = 0,
):
    """torch MultiStepLR schedule (+ optional linear warmup — the reference's
    warmup-dampened LR step, train/train.py:50-55) as an optax schedule."""

    def schedule(step):
        lr = jnp.asarray(base_lr, jnp.float32)
        for m in milestones:
            lr = jnp.where(step >= m, lr * gamma, lr)
        if warmup_steps > 0:
            lr = lr * jnp.minimum(1.0, (step + 1) / warmup_steps)
        return lr

    return schedule


def ema_params(decay: float = 0.999):
    """Exponential moving average of params (the reference's optional
    ema_model, train/train.py:47-49) as a standalone optax-style transform:
    ``ema_state = update_ema(ema_state, params)``."""

    def init(params):
        import jax

        return jax.tree.map(lambda p: p, params)

    def update(ema, params):
        import jax

        return jax.tree.map(lambda e, p: decay * e + (1 - decay) * p, ema, params)

    return init, update


def make_optimizer(
    encoder_lr: float,
    decoder_lr: float,
    milestones: tuple[int, ...],
    weight_decay: float = 0.01,
    grad_clip: float = 0.01,
    is_encoder: Callable | None = None,
    warmup_steps: int = 0,
):
    """Two-group AdamW + MultiStepLR + clip, as an optax transform.

    ``is_encoder(path, leaf) -> bool`` classifies params; defaults to a
    top-level "encoder" key (the RoMaNet layout). ``warmup_steps`` enables the
    reference's warmup-dampened LR stepping (train/train.py:61-63) as a linear
    ramp inside the schedule.

    Frozen params (default: anything under a "dinov2" key) get
    ``optax.set_to_zero``: the reference hides DINOv2 from the optimizer
    entirely (encoders.py:50 — the ``[dinov2_vitl14]`` list hack), so it
    must see no AdamW state (~2.4 GB for ViT-L m+v) and, critically, no
    weight decay — AdamW with zero grads still emits ``-lr*wd*p`` updates,
    which would silently shrink the frozen backbone over a training run.

    The norm clip is one GLOBAL clip across all trainable grads before the
    per-group transforms (reference train/train.py:30 clips
    ``model.parameters()`` as a whole); per-group clipping would rescale
    encoder and decoder independently, which at the recipe's tight 0.01
    norm (almost always active) changes the effective update direction.
    """
    if is_encoder is None:
        def is_encoder(path, _leaf):
            return any(getattr(k, "key", None) == "encoder" for k in path)

    def is_frozen(path, _leaf):
        return any(getattr(k, "key", None) == "dinov2" for k in path)

    def adamw(lr):
        return optax.adamw(
            multistep_lr(lr, milestones, warmup_steps=warmup_steps),
            weight_decay=weight_decay,
        )

    def label_fn(params):
        import jax

        def label(path, leaf):
            if is_frozen(path, leaf):
                return "frozen"
            return "encoder" if is_encoder(path, leaf) else "decoder"

        return jax.tree_util.tree_map_with_path(label, params)

    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.multi_transform(
            {
                "encoder": adamw(encoder_lr),
                "decoder": adamw(decoder_lr),
                "frozen": optax.set_to_zero(),
            },
            label_fn,
        ),
    )
