"""Train big RoMa on MegaDepth — the TPU-native equivalent of the reference
``torchrun experiments/train_roma_outdoor.py`` (reference
experiments/train_roma_outdoor.py:169-308).

Recipe parity: two overlap-band dataset copies (0.01/0.35, shake 32, flip
aug), 1/n^0.75 scene weighting, RobustLosses (cls@16 + robust regression,
alpha=0.5, c=1e-4, local_dist {1:4,2:4,4:8,8:8}), AdamW with encoder/decoder
LRs scaled by global batch, MultiStepLR decay at 90% of 8M samples, grad clip
0.01, checkpoint + dense benchmark every 25k samples.

TPU design: jax.distributed for multi-host, one jitted DP train step over the
``data`` mesh, host thread-pool loader with per-host index shard.

Usage: python experiments/train_roma_outdoor.py --data_root data/megadepth \
           --gpu_batch_size 8 [--only_test] [--train_resolution medium]
"""
from __future__ import annotations

import argparse
import json
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
    from roma_tpu.benchmarks import MegadepthDenseBenchmark
    from roma_tpu.datasets.loader import DataLoader, weighted_sample_indices
    from roma_tpu.datasets.megadepth import ConcatDataset, MegadepthBuilder
    from roma_tpu.datasets.transforms import RandomErasing
    from roma_tpu.models.matcher import RoMaNet
    from roma_tpu.parallel.mesh import get_mesh
    from roma_tpu.train import (
        CheckPoint,
        RobustLosses,
        init_train_state,
        make_optimizer,
        make_train_step,
        train_k_steps,
    )

    h, w = RESOLUTIONS[args.train_resolution]
    mesh = get_mesh()
    n_dev = len(jax.devices())
    gpu_batch = args.gpu_batch_size
    batch_size = gpu_batch * n_dev
    step_size = batch_size  # samples per step (reference STEP_SIZE)

    n_samples = 8_000_000
    k_samples = 25_000
    n_steps = n_samples // step_size
    checkpoint_every = max(k_samples // step_size, 1)

    # model
    net = RoMaNet(
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        train_mode=True,
        remat=args.remat,
    )
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 56, 56, 3), jnp.float32)
    variables = jax.jit(net.init)(rng, dummy, dummy)
    if args.pretrained_backbone:
        # reference trains with pretrained_backbone=True (torchvision VGG19-BN
        # + frozen pretrained DINOv2, train_roma_outdoor.py:187)
        from roma_tpu.models.zoo import pretrained_backbone

        variables = pretrained_backbone(
            variables, dinov2_weights=args.dinov2_weights, vgg_weights=args.vgg_weights
        )

    # datasets: two overlap bands (reference :199-212)
    mega = MegadepthBuilder(data_root=args.data_root, loftr_ignore=True, imc21_ignore=True)
    eraser = RandomErasing(p=0.2)
    common = dict(
        ht=h, wt=w, shake_t=32, use_horizontal_flip_aug=True, random_eraser=eraser,
        rank=jax.process_index(),
    )
    scenes = mega.build_scenes(split="train_loftr", min_overlap=0.01, **common)
    scenes += mega.build_scenes(split="train_loftr", min_overlap=0.35, max_overlap=0.9, **common)
    dataset = ConcatDataset(scenes)
    weights = MegadepthBuilder.weight_scenes(dataset, alpha=0.75)

    objective = RobustLosses(
        ce_weight=0.01,
        local_dist=((1, 4.0), (2, 4.0), (4, 8.0), (8, 8.0)),
        local_largest_scale=8,
        alpha=0.5,
        c=1e-4,
    )
    optimizer = make_optimizer(
        encoder_lr=step_size * 5e-6 / 8,
        decoder_lr=step_size * 1e-4 / 8,
        milestones=(int(0.9 * n_steps),),
        grad_clip=0.01,
        warmup_steps=args.warmup_steps,
    )

    def apply_fn(v, batch):
        corresps, mut = net.apply(
            v, batch["im_A"], batch["im_B"], mutable=["batch_stats"]
        )
        return corresps, mut["batch_stats"]

    train_step = make_train_step(apply_fn, objective, optimizer, mesh=mesh)
    state = init_train_state(variables, optimizer, mesh=mesh)
    checkpointer = CheckPoint(args.ckpt_dir, "train_roma_outdoor")
    state = checkpointer.load(state)

    bench = None
    if not args.skip_eval:
        bench = MegadepthDenseBenchmark(args.data_root, num_samples=256)

    host_rng = np.random.RandomState(jax.process_index())
    while state.step < n_steps and not args.only_test:
        idxs = weighted_sample_indices(host_rng, weights, min(k_samples, len(dataset)))
        loader = DataLoader(
            dataset, idxs, batch_size,
            num_workers=args.num_workers,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )
        state, metrics = train_k_steps(
            state, loader, train_step, mesh=mesh,
            ema_decay=args.ema_decay if args.ema_decay > 0 else None,
            warn_nonfinite=args.warn_nonfinite,
            progress=lambda s, m: print(
                f"step {s}: loss={float(m['loss']):.4f} grad_norm={float(m['grad_norm']):.4f}"
            )
            if s % args.log_every == 0
            else None,
        )
        checkpointer.save(state)
        if bench is not None and jax.process_index() == 0:
            from roma_tpu.models.roma import RegressionMatcher

            eval_model = RegressionMatcher(
                {"params": state.params, "batch_stats": state.batch_stats},
                h=h, w=w, upsample_preds=False, symmetric=False,
            )
            results = bench.benchmark(eval_model, batch_size=gpu_batch)
            print(json.dumps({"step": state.step, **results}))
    print("training done at step", state.step)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", default="data/megadepth")
    parser.add_argument("--ckpt_dir", default="workspace/checkpoints")
    parser.add_argument("--gpu_batch_size", type=int, default=8)
    parser.add_argument("--train_resolution", default="medium", choices=RESOLUTIONS)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--log_every", type=int, default=50)
    parser.add_argument("--only_test", action="store_true")
    parser.add_argument("--skip_eval", action="store_true")
    parser.add_argument("--bf16", action="store_true", default=True)
    parser.add_argument(
        "--remat", action=argparse.BooleanOptionalAction, default=True,
        help="jax.checkpoint VGG+refiners; without it 560^2 bs2 already "
        "overflows a 16 GB v5e (measured 48 G at bs8)",
    )
    parser.add_argument("--distributed", action="store_true")
    # reference always trains from a pretrained backbone
    # (train_roma_outdoor.py:187 pretrained_backbone=True)
    parser.add_argument(
        "--pretrained_backbone", action=argparse.BooleanOptionalAction,
        default=True,
        help="load torchvision VGG19-BN + DINOv2 vitl14 encoder weights "
        "(auto-download or --dinov2_weights/--vgg_weights paths)",
    )
    parser.add_argument("--dinov2_weights", default=None,
                        help="local dinov2_vitl14_pretrain.pth")
    parser.add_argument("--vgg_weights", default=None,
                        help="local torchvision vgg19_bn .pth")
    # reference train_k_steps optional extras (train/train.py:42,59-63)
    parser.add_argument("--ema_decay", type=float, default=0.0,
                        help="EMA of params; 0 disables (ref ema_model)")
    parser.add_argument("--warmup_steps", type=int, default=0,
                        help="linear LR warmup steps (ref warmup.dampening())")
    parser.add_argument("--warn_nonfinite", action="store_true",
                        help="print param names with nan/inf grads each step")
    run(parser.parse_args())
