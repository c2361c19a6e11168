"""Data-parallel training step + loop (reference romatch/train/train.py:23-64,
experiments/train_roma_outdoor.py:169-251).

TPU-native design: ONE jitted train step with sharding annotations — params
and optimizer state replicated, batch sharded over the 1-D ``data`` mesh; XLA
inserts the gradient all-reduce (the DDP/NCCL replacement). BatchNorm batch
stats are updated locally and cross-replica averaged with the same implicit
collectives (reference DDP does not sync BN either — it uses local stats).

No GradScaler (bf16), grad clip handled inside the optax chain.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import replicate, shard_batch


@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: int = 0
    ema_params: Any = None  # optional EMA of params (reference train.py:59-60)


def _is_encoder_path(path) -> bool:
    return any(getattr(k, "key", None) == "encoder" for k in path)


def grad_statistics(params, grads):
    """Per-leaf/group gradient statistics + non-finite detection (the
    reference's ``log_param_statistics``, train/train.py:7-21).

    Returns a metrics dict: total ``grad_norm``/``param_norm``, per-group
    encoder/decoder grad norms, ``nonfinite_grads`` (count of leaves with a
    non-finite gradient) and ``grad_finite_mask`` (per-leaf, tree-flatten
    order — map back to names with :func:`nonfinite_grad_names`).
    """
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    leaf_norms = jnp.stack(
        [jnp.linalg.norm(v.astype(jnp.float32).ravel()) for _, v in flat]
    )
    finite = jnp.isfinite(leaf_norms)
    is_enc = jnp.asarray([_is_encoder_path(p) for p, _ in flat])
    safe = jnp.where(finite, leaf_norms, 0.0)
    group = lambda m: jnp.sqrt(jnp.sum(jnp.where(m, safe, 0.0) ** 2))
    return {
        "grad_norm": jnp.linalg.norm(safe),
        "param_norm": optax.global_norm(params),
        "grad_norm_encoder": group(is_enc),
        "grad_norm_decoder": group(~is_enc),
        "nonfinite_grads": jnp.sum(~finite).astype(jnp.float32),
        "grad_finite_mask": finite.astype(jnp.float32),
    }


def nonfinite_grad_names(params, grad_finite_mask) -> list[str]:
    """Map a ``grad_finite_mask`` metric back to parameter names."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    mask = jax.device_get(grad_finite_mask)
    return [
        jax.tree_util.keystr(path)
        for (path, _), ok in zip(flat, mask)
        if ok < 1.0
    ]


def ema_decay_schedule(decay: float, step):
    """Warmup-ramped EMA decay: ``min(decay, (1+t)/(10+t))`` (timm-style).

    A plain ``decay*ema + (1-decay)*params`` EMA initialised at the random
    init carries ``decay^t`` of that init — at decay 0.995 still ~29% after
    250 steps, so early EMA evals report garbage (reference
    romatch/train/train.py:47-60 has the same flaw; measured in
    CONVERGENCE_r04: EMA PCK@5 0.09 vs raw 0.70). The ramp makes the first
    ~10 updates track the raw params almost exactly (d_0 = 0.1) and converges
    to the configured decay, eliminating the init bias: the init weight after
    t steps is ``prod min(decay,(s+1)/(s+10))`` — e.g. ~1e-17 at t=250 vs
    0.29 unramped.
    """
    t = jnp.asarray(step, jnp.float32)
    return jnp.minimum(jnp.asarray(decay, jnp.float32), (1.0 + t) / (10.0 + t))


def make_ema_update(decay: float, warmup: bool = True):
    """Build a jitted EMA update ``(ema, params, step) -> new_ema``.

    ``warmup=True`` (default) applies :func:`ema_decay_schedule`; ``step`` is
    the 0-based count of EMA updates already applied.
    """

    def update(ema, params, step):
        d = ema_decay_schedule(decay, step) if warmup else decay
        return jax.tree.map(
            lambda a, b: d * a.astype(jnp.float32) + (1 - d) * b.astype(jnp.float32),
            ema, params,
        )

    return jax.jit(update)


def make_train_step(
    apply_fn: Callable,
    objective: Callable,
    optimizer: optax.GradientTransformation,
    mesh: Mesh | None = None,
):
    """Build the jitted train step.

    ``apply_fn(variables, batch, train=True, rngs=...) -> (corresps, new_batch_stats)``
    ``objective(corresps, batch) -> (loss, metrics)``
    """

    def loss_fn(params, batch_stats, batch):
        corresps, new_stats = apply_fn(
            {"params": params, "batch_stats": batch_stats}, batch
        )
        loss, metrics = objective(corresps, batch)
        return loss, (metrics, new_stats)

    def step_fn(params, batch_stats, opt_state, batch):
        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, batch)
        if mesh is not None:
            # the DDP all-reduce: gradients (and metrics/BN stats) averaged
            # over the data axis via ICI collectives
            grads = jax.lax.pmean(grads, "data")
            new_stats = jax.lax.pmean(new_stats, "data")
            metrics = jax.lax.pmean(metrics, "data")
            loss = jax.lax.pmean(loss, "data")
        stats = grad_statistics(params, grads)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = dict(metrics, **stats, loss=loss)
        return new_params, new_stats, new_opt_state, metrics

    if mesh is None:
        return jax.jit(step_fn)

    # shard_map: ONE per-device program (compile cost independent of mesh
    # size) with explicit pmean collectives — the pmap-style DDP equivalent.
    # GSPMD propagation over the full graph is much slower to compile and
    # buys nothing for pure data parallelism.
    sharded = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("data")),
        out_specs=(P(), P(), P(), P()),
        # pallas_call out_shapes carry no varying-mesh-axes annotation, and
        # the TPU lowering of the step contains pallas kernels (fused
        # attention); the vma static check rejects them (jax 0.9)
        check_vma=False,
    )
    return jax.jit(sharded)


def train_k_steps(
    state: TrainState,
    batches,
    train_step,
    mesh: Mesh | None = None,
    progress: Callable | None = None,
    ema_decay: float | None = None,
    warn_nonfinite: bool = False,
):
    """Run the step over an iterable of host batches (reference
    train/train.py:40-64 without the tqdm/wandb coupling).

    ``ema_decay`` maintains ``state.ema_params`` with the warmup-ramped decay
    of :func:`ema_decay_schedule` (reference ema_model.update(),
    train.py:59-60, which is unramped and init-biased — see the schedule's
    docstring); LR warmup is part of the optax schedule
    (``make_optimizer(warmup_steps=...)`` — the reference's warmup.dampening(),
    train.py:61-63). ``warn_nonfinite=True`` reads back the per-leaf finite
    mask each step and prints offending parameter names (reference
    train.py:18-19) — costs one host sync per step.
    """
    ema_update = None
    if ema_decay is not None:
        if state.ema_params is None:
            state.ema_params = jax.tree.map(
                lambda p: p.astype(jnp.float32), state.params
            )
        ema_update = make_ema_update(ema_decay)
    metrics = {}
    # EMA-update count: resumes (restored state.step) keep the ramp converged
    ema_t = state.step
    for batch in batches:
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        state.params, state.batch_stats, state.opt_state, metrics = train_step(
            state.params, state.batch_stats, state.opt_state, batch
        )
        if ema_update is not None:
            state.ema_params = ema_update(state.ema_params, state.params, ema_t)
            ema_t += 1
        state.step += 1
        if warn_nonfinite and float(metrics["nonfinite_grads"]) > 0:
            names = nonfinite_grad_names(state.params, metrics["grad_finite_mask"])
            print(f"These params have nan or inf grads: {names}")
        if progress is not None:
            progress(state.step, metrics)
    return state, metrics


def train_epoch(state: TrainState, loader, train_step, mesh: Mesh | None = None):
    """One full pass over a loader (reference train/train.py:67-84 legacy)."""
    return train_k_steps(state, loader, train_step, mesh=mesh)


def train_k_epochs(state: TrainState, make_loader, train_step, k: int,
                   mesh: Mesh | None = None):
    """k epochs over freshly constructed loaders (reference train.py:87-102)."""
    metrics = {}
    for _ in range(k):
        state, metrics = train_epoch(state, make_loader(), train_step, mesh=mesh)
    return state, metrics


def init_train_state(variables, optimizer, mesh: Mesh | None = None) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    if mesh is not None:
        params = replicate(params, mesh)
        batch_stats = replicate(batch_stats, mesh)
        opt_state = replicate(opt_state, mesh)
    return TrainState(params=params, batch_stats=batch_stats, opt_state=opt_state)
