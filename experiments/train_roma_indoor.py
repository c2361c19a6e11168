"""Train big RoMa indoor — alternating MegaDepth / ScanNet batches
(reference experiments/roma_indoor.py:169-322).

Two loss instances (ScanNet uses ce_weight=0, reference :214-229); per-step
alternation between the two dataset streams; otherwise the outdoor recipe.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

RESOLUTIONS = {"low": (448, 448), "medium": (560, 560), "high": (672, 672)}


def run(args):
    if args.distributed:
        jax.distributed.initialize()
    from roma_tpu.datasets.loader import DataLoader, weighted_sample_indices
    from roma_tpu.datasets.megadepth import ConcatDataset, MegadepthBuilder
    from roma_tpu.datasets.scannet import ScanNetBuilder
    from roma_tpu.models.matcher import RoMaNet
    from roma_tpu.parallel.mesh import get_mesh, shard_batch
    from roma_tpu.train import (
        CheckPoint,
        RobustLosses,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    h, w = RESOLUTIONS[args.train_resolution]
    mesh = get_mesh()
    n_dev = len(jax.devices())
    batch_size = args.gpu_batch_size * n_dev
    n_steps = 8_000_000 // batch_size
    k_samples = 25_000

    net = RoMaNet(
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        train_mode=True,
        remat=args.remat,
    )
    dummy = jnp.zeros((1, 56, 56, 3), jnp.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), dummy, dummy)
    if args.pretrained_backbone:
        # reference trains with pretrained_backbone=True (roma_indoor.py:246)
        from roma_tpu.models.zoo import pretrained_backbone

        variables = pretrained_backbone(
            variables, dinov2_weights=args.dinov2_weights, vgg_weights=args.vgg_weights
        )

    mega = MegadepthBuilder(data_root=args.mega_root)
    mega_ds = ConcatDataset(
        mega.build_scenes(split="train_loftr", min_overlap=0.01, ht=h, wt=w, shake_t=32,
                          rank=jax.process_index())
    )
    mega_w = MegadepthBuilder.weight_scenes(mega_ds, alpha=0.75)
    scannet = ScanNetBuilder(data_root=args.scannet_root)
    scan_ds = scannet.build_concat(split="train", ht=h, wt=w)
    scan_w = ScanNetBuilder.weight_scenes(scan_ds, alpha=0.75)

    mega_loss = RobustLosses(ce_weight=0.01, alpha=0.5, c=1e-4)
    scan_loss = RobustLosses(ce_weight=0.0, alpha=0.5, c=1e-4)
    optimizer = make_optimizer(
        encoder_lr=batch_size * 5e-6 / 8,
        decoder_lr=batch_size * 1e-4 / 8,
        milestones=(int(0.9 * n_steps),),
        grad_clip=0.01,
    )

    def apply_fn(v, batch):
        corresps, mut = net.apply(v, batch["im_A"], batch["im_B"], mutable=["batch_stats"])
        return corresps, mut["batch_stats"]

    steps = {
        "mega": make_train_step(apply_fn, mega_loss, optimizer, mesh=mesh),
        "scannet": make_train_step(apply_fn, scan_loss, optimizer, mesh=mesh),
    }
    state = init_train_state(variables, optimizer, mesh=mesh)
    ckpt = CheckPoint(args.ckpt_dir, "train_roma_indoor")
    state = ckpt.load(state)

    host_rng = np.random.RandomState(jax.process_index())
    while state.step < n_steps:
        loaders = {}
        for name, (ds, ws) in {"mega": (mega_ds, mega_w), "scannet": (scan_ds, scan_w)}.items():
            idxs = weighted_sample_indices(host_rng, ws, min(k_samples, len(ds)))
            loaders[name] = iter(
                DataLoader(ds, idxs, batch_size, num_workers=args.num_workers,
                           process_index=jax.process_index(),
                           process_count=jax.process_count())
            )
        try:
            while True:
                # per-step alternation (reference roma_indoor.py:272-278)
                name = "mega" if state.step % 2 == 0 else "scannet"
                batch = shard_batch(next(loaders[name]), mesh)
                state.params, state.batch_stats, state.opt_state, metrics = steps[name](
                    state.params, state.batch_stats, state.opt_state, batch
                )
                state.step += 1
                if state.step % args.log_every == 0:
                    print(f"step {state.step}: loss={float(metrics['loss']):.4f}")
        except StopIteration:
            pass
        ckpt.save(state)
    print("done at", state.step)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--mega_root", default="data/megadepth")
    p.add_argument("--scannet_root", default="data/scannet")
    p.add_argument("--ckpt_dir", default="workspace/checkpoints")
    p.add_argument("--gpu_batch_size", type=int, default=8)
    p.add_argument("--train_resolution", default="medium", choices=RESOLUTIONS)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--remat", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--distributed", action="store_true")
    p.add_argument("--pretrained_backbone", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="load torchvision VGG19-BN + DINOv2 vitl14 encoder "
                   "weights (reference pretrained_backbone=True)")
    p.add_argument("--dinov2_weights", default=None)
    p.add_argument("--vgg_weights", default=None)
    run(p.parse_args())
