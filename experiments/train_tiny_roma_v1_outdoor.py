"""Train Tiny RoMa v1 on MegaDepth (reference
experiments/train_tiny_roma_v1_outdoor.py:325-497).

Recipe: 2M pairs at (768, 1024), UNNORMALIZED images (reference :357), frozen
XFeat, TinyRobustLosses (corr-volume InfoNCE + gated regression), AdamW,
grad clip 0.01.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def run(args):
    from roma_tpu.datasets.loader import DataLoader, weighted_sample_indices
    from roma_tpu.datasets.megadepth import ConcatDataset, MegadepthBuilder
    from roma_tpu.models.tiny import TinyRoMaNet
    from roma_tpu.parallel.mesh import get_mesh
    from roma_tpu.train import (
        CheckPoint,
        TinyRobustLosses,
        init_train_state,
        make_optimizer,
        make_train_step,
        train_k_steps,
    )

    h, w = args.h, args.w
    mesh = get_mesh()
    batch_size = args.gpu_batch_size * len(jax.devices())
    n_steps = 2_000_000 // batch_size

    net = TinyRoMaNet(train_mode=True, freeze_xfeat=True,
                      dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), dummy, dummy)
    # pretrained XFeat backbone (the reference hub-loads it,
    # model_zoo/__init__.py:23-27); auto-download when no path given
    from roma_tpu.models.zoo import (
        WEIGHT_URLS,
        _fetch_state_dict,
        _load_torch_state_dict,
        convert,
    )

    xfeat_sd = (
        _load_torch_state_dict(args.xfeat_weights)
        if args.xfeat_weights
        else _fetch_state_dict(WEIGHT_URLS["xfeat"])
    )
    if xfeat_sd is not None:
        xf_params, xf_stats = convert.convert_xfeat(xfeat_sd)
        variables["params"]["xfeat"] = jax.tree.map(jnp.asarray, xf_params)
        variables["batch_stats"]["xfeat"] = jax.tree.map(jnp.asarray, xf_stats)
    else:
        print("train_tiny: XFeat weights unavailable; frozen backbone stays "
              "randomly initialized (will not reproduce the reference recipe)")

    mega = MegadepthBuilder(data_root=args.data_root)
    common = dict(ht=h, wt=w, normalize=False, shake_t=32,
                  rank=jax.process_index())
    scenes = mega.build_scenes(split="train_loftr", min_overlap=0.01, **common)
    scenes += mega.build_scenes(split="train_loftr", min_overlap=0.35, max_overlap=0.9, **common)
    dataset = ConcatDataset(scenes)
    weights = MegadepthBuilder.weight_scenes(dataset, alpha=0.75)

    objective = TinyRobustLosses(
        ce_weight=0.01, alpha=0.5, c=1e-4, epe_mask_prob_th=0.001,
        cert_only_on_consistent_depth=False,
    )
    optimizer = make_optimizer(
        encoder_lr=batch_size * 5e-6 / 8,
        decoder_lr=batch_size * 1e-4 / 8,
        milestones=(int(0.8 * n_steps), int(0.9 * n_steps)),
        grad_clip=0.01,
        # no frozen-encoder group: xfeat grads are stop_gradient'd to zero
        is_encoder=lambda path, leaf: any(getattr(k, "key", None) == "xfeat" for k in path),
    )

    def apply_fn(v, batch):
        corresps, mut = net.apply(v, batch["im_A"], batch["im_B"], mutable=["batch_stats"])
        return corresps, mut["batch_stats"]

    step = make_train_step(apply_fn, objective, optimizer, mesh=mesh)
    state = init_train_state(variables, optimizer, mesh=mesh)
    ckpt = CheckPoint(args.ckpt_dir, "train_tiny_roma_v1_outdoor")
    state = ckpt.load(state)

    host_rng = np.random.RandomState(jax.process_index())
    while state.step < n_steps:
        idxs = weighted_sample_indices(host_rng, weights, min(25_000, len(dataset)))
        loader = DataLoader(dataset, idxs, batch_size, num_workers=args.num_workers,
                            process_index=jax.process_index(),
                            process_count=jax.process_count())
        state, metrics = train_k_steps(
            state, loader, step, mesh=mesh,
            progress=lambda s, m: print(f"step {s}: loss={float(m['loss']):.4f}")
            if s % args.log_every == 0 else None,
        )
        ckpt.save(state)
    print("done at", state.step)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", default="data/megadepth")
    p.add_argument("--ckpt_dir", default="workspace/checkpoints")
    p.add_argument("--xfeat_weights", default=None)
    p.add_argument("--gpu_batch_size", type=int, default=8)
    p.add_argument("--h", type=int, default=768)
    p.add_argument("--w", type=int, default=1024)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--bf16", action="store_true", default=True)
    run(p.parse_args())
