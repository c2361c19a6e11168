"""Synthetic convergence run (VERDICT r3 item 6 / r4 item 3).

A few hundred DP train steps of the FULL recipe — RobustLosses (coarse cls
@16 + Charbonnier regression + local-dist gating), two-group AdamW with
warmup + MultiStep schedule, grad clip 0.01, warmup-ramped EMA — driven by
geometrically exact synthetic posed pairs. Silent loss-wiring bugs (scale
gating, stop-gradients, cls target construction) only show up over hundreds
of steps; the reference's recipe is 250k steps (reference
experiments/train_roma_outdoor.py:191-251).

Two regimes:
  --config tiny (default): ``RoMaConfig.tiny()`` at res 112 on the 8-device
    CPU mesh (round-4 result: PCK@5 0.01 -> 0.70 over 250 steps).
  --config full: the real ``RoMaConfig()`` at 560^2 with the bs4 remat path
    (COMPONENTS.md "Training memory") on the real TPU chip
    (``--platform tpu --devices 1``) — proves the production architecture
    trains past one step (VERDICT r4 item 3).

Scene model: an infinite textured plane (smooth random Fourier texture, so
correspondence is learnable from photometry) fronto-parallel to camera A at
depth d ~ U(4, 8); camera B = small rotation (<= ~2 deg/axis) + translation.
Both images and both depth maps are rendered ANALYTICALLY from the plane
geometry (no resampling), so ``get_gt_warp`` recovers the exact
correspondence field and PCK against it is meaningful.

Writes CONVERGENCE_<tag>.json + /tmp/convergence_<tag>.jsonl.

  python tools/convergence_run.py [--steps 300] [--res 112] [--batch 8]
  python tools/convergence_run.py --config full --platform tpu --devices 1 \
      --res 560 --batch 4 --steps 200 --tag r05
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

_PLATFORM = "cpu"
for _i, _a in enumerate(sys.argv):
    if _a == "--platform" and _i + 1 < len(sys.argv):
        _PLATFORM = sys.argv[_i + 1]
    elif _a.startswith("--platform="):
        _PLATFORM = _a.split("=", 1)[1]

import jax

if _PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _texture(rs: np.random.RandomState, n_comp: int = 10):
    """Smooth random Fourier texture R^2 -> [0,1]^3 (world-plane units)."""
    freq = rs.uniform(0.15, 1.6, (3, n_comp, 2))
    phase = rs.uniform(0, 2 * math.pi, (3, n_comp))
    amp = rs.uniform(0.3, 1.0, (3, n_comp)) / np.sqrt(n_comp)

    def f(x, y):
        # x, y: (H, W) world-plane coords -> (H, W, 3)
        arg = (
            freq[..., 0][:, :, None, None] * x[None, None]
            + freq[..., 1][:, :, None, None] * y[None, None]
            + phase[:, :, None, None]
        )
        v = (amp[:, :, None, None] * np.sin(arg)).sum(1)  # (3, H, W)
        v = 0.5 + 0.5 * v / (np.abs(v).max() + 1e-6)
        return np.transpose(v, (1, 2, 0)).astype(np.float32)

    return f


def _small_rotation(rs, max_deg=2.0):
    a = np.deg2rad(rs.uniform(-max_deg, max_deg, 3))
    cx, sx = np.cos(a[0]), np.sin(a[0])
    cy, sy = np.cos(a[1]), np.sin(a[1])
    cz, sz = np.cos(a[2]), np.sin(a[2])
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return (Rz @ Ry @ Rx).astype(np.float64)


def make_pair(rs: np.random.RandomState, res: int):
    """One posed pair. Pixel k has continuous coord k+0.5 (the reference's
    [0.5, w-0.5] convention, utils.py:402-404)."""
    f = float(res)  # focal
    cx = cy = res / 2.0
    K = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]], np.float64)
    d = rs.uniform(4.0, 8.0)
    R = _small_rotation(rs)
    # translation: up to ~12 px image shift + slight depth change
    t = np.array(
        [rs.uniform(-0.1, 0.1) * d, rs.uniform(-0.1, 0.1) * d, rs.uniform(-0.05, 0.05) * d]
    )
    tex = _texture(rs)

    u = np.arange(res, dtype=np.float64) + 0.5
    uu, vv = np.meshgrid(u, u, indexing="xy")

    # camera A: fronto-parallel plane at z=d (A frame == world frame)
    XA = (uu - cx) / f * d
    YA = (vv - cy) / f * d
    im_A = tex(XA, YA)
    depth_A = np.full((res, res), d, np.float32)

    # camera B: X_B = R X_A + t; plane n=(0,0,1), n.X_A = d
    # ray r = K^-1 (u, v, 1); s = (d + m.t) / (m.r), m = R n
    m = R[:, 2]  # R @ n
    rx = (uu - cx) / f
    ry = (vv - cy) / f
    denom = m[0] * rx + m[1] * ry + m[2]
    s = (d + m @ t) / denom
    XB, YB, ZB = s * rx, s * ry, s
    depth_B = ZB.astype(np.float32)
    # world point = R^T (X_B - t)
    P = np.stack([XB - t[0], YB - t[1], ZB - t[2]], -1) @ R  # (H,W,3) (R^T)^T
    im_B = tex(P[..., 0], P[..., 1])

    T = np.eye(4)
    T[:3, :3], T[:3, 3] = R, t
    norm = lambda im: (im - IMAGENET_MEAN) / IMAGENET_STD
    return {
        "im_A": norm(im_A),
        "im_B": norm(im_B),
        "im_A_depth": depth_A,
        "im_B_depth": depth_B,
        "T_1to2": T.astype(np.float32),
        "K1": K.astype(np.float32),
        "K2": K.astype(np.float32),
    }


def make_batch(rs, b, res):
    items = [make_pair(rs, res) for _ in range(b)]
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


def dense_pck(corresps, batch, thresholds=(1.0, 3.0, 5.0)):
    """PCK of the scale-1 flow vs the analytic GT warp (valid pixels)."""
    from roma_tpu.train.gt_warp import get_gt_warp

    flow = np.asarray(corresps[1]["flow"], np.float32)
    b, h, w, _ = flow.shape
    x2, prob = get_gt_warp(
        batch["im_A_depth"], batch["im_B_depth"], batch["T_1to2"],
        batch["K1"], batch["K2"], H=h, W=w,
    )
    x2, prob = np.asarray(x2), np.asarray(prob)
    # normalized -> pixel error (B-image pixels)
    err = np.linalg.norm((flow - x2) * np.array([w / 2, h / 2]), axis=-1)
    m = prob > 0.99
    return {f"pck_{int(t)}": float((err[m] < t).mean()) for t in thresholds}, float(
        err[m].mean()
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--res", type=int, default=112)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--log_every", type=int, default=10)
    ap.add_argument("--config", choices=("tiny", "full"), default="tiny")
    ap.add_argument("--platform", choices=("cpu", "tpu"), default="cpu")
    ap.add_argument("--tag", default="r04")
    args = ap.parse_args()

    if args.platform == "cpu":
        jax.config.update("jax_num_cpu_devices", args.devices)

    from roma_tpu.models.config import RoMaConfig
    from roma_tpu.models.matcher import RoMaNet
    from roma_tpu.parallel.mesh import get_mesh, shard_batch
    from roma_tpu.train import (
        RobustLosses,
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from roma_tpu.train.train import make_ema_update
    from roma_tpu.utils.fast_init import shape_init

    mesh = get_mesh(args.devices)
    cfg = RoMaConfig.tiny() if args.config == "tiny" else RoMaConfig()
    # full config: production train regime — bf16 compute + remat (the bs4
    # 560^2 path from COMPONENTS.md "Training memory")
    full = args.config == "full"
    net = RoMaNet(
        config=cfg,
        train_mode=True,
        dtype=jnp.bfloat16 if full else jnp.float32,
        remat=full,
    )
    variables = shape_init(
        net.init, jax.random.PRNGKey(0),
        jnp.zeros((1, args.res, args.res, 3), jnp.float32),
        jnp.zeros((1, args.res, args.res, 3), jnp.float32),
    )

    def apply_fn(variables, batch):
        corresps, mut = net.apply(
            variables, batch["im_A"], batch["im_B"], mutable=["batch_stats"]
        )
        return corresps, mut["batch_stats"]

    # full reference recipe shape (experiments/train_roma_outdoor.py:214-227),
    # LRs scaled to the tiny model + synthetic task
    objective = RobustLosses(
        ce_weight=0.01,
        local_dist=((1, 4.0), (2, 4.0), (4, 8.0), (8, 8.0)),
        local_largest_scale=8,
        alpha=0.5,
        c=1e-4,
    )
    optimizer = make_optimizer(
        encoder_lr=2e-4,
        decoder_lr=6e-4,
        milestones=(int(0.9 * args.steps),),
        grad_clip=0.01,
        warmup_steps=20,
    )
    step = make_train_step(apply_fn, objective, optimizer, mesh=mesh)
    state = init_train_state(variables, optimizer, mesh=mesh)

    # warmup-ramped EMA (train/train.py:ema_decay_schedule) — the plain EMA
    # still carries ~29% of random init after 250 steps at decay 0.995
    # (measured: CONVERGENCE_r04 eval_pck_after_ema 0.09 vs raw 0.70)
    ema_decay = 0.995
    state.ema_params = jax.tree.map(lambda p: p.astype(jnp.float32), state.params)
    ema_update = make_ema_update(ema_decay)

    rs = np.random.RandomState(0)
    eval_batch = make_batch(np.random.RandomState(999), args.batch, args.res)
    eval_apply = jax.jit(
        lambda v, a, bimg: net.apply(v, a, bimg, mutable=["batch_stats"])[0]
    )

    def eval_pck(params):
        corresps = eval_apply(
            {"params": params, "batch_stats": state.batch_stats},
            eval_batch["im_A"], eval_batch["im_B"],
        )
        return dense_pck(corresps, eval_batch)

    logf = open(f"/tmp/convergence_{args.tag}.jsonl", "w")
    t0 = time.time()
    history = []
    pck0, epe0 = eval_pck(state.params)
    print(f"step 0: eval {pck0} epe_px {epe0:.2f}", flush=True)
    for i in range(1, args.steps + 1):
        batch = shard_batch(make_batch(rs, args.batch, args.res), mesh)
        state.params, state.batch_stats, state.opt_state, metrics = step(
            state.params, state.batch_stats, state.opt_state, batch
        )
        state.ema_params = ema_update(state.ema_params, state.params, i - 1)
        state.step += 1
        if i % args.log_every == 0 or i == 1:
            # BN-stat health: running means/vars must stay finite and the
            # vars strictly positive (VERDICT r4 item 3)
            bn_leaves = jax.tree.leaves(state.batch_stats)
            bn_finite = all(bool(jnp.isfinite(x).all()) for x in bn_leaves)
            rec = {
                "step": i,
                "loss": float(metrics["loss"]),
                "gm_cls_loss_16": float(metrics.get("gm_cls_loss_16", np.nan)),
                "train_pck_05": float(metrics.get("train_pck_05", np.nan)),
                "grad_norm": float(metrics.get("grad_norm", np.nan)),
                "nonfinite_grads": float(metrics.get("nonfinite_grads", np.nan)),
                "bn_stats_finite": bn_finite,
                "wall_s": round(time.time() - t0, 1),
            }
            history.append(rec)
            logf.write(json.dumps(rec) + "\n")
            logf.flush()
            print(rec, flush=True)
    pck1, epe1 = eval_pck(state.params)
    pck_ema, epe_ema = eval_pck(state.ema_params)
    print(f"final eval {pck1} epe_px {epe1:.2f} | ema {pck_ema} epe {epe_ema:.2f}", flush=True)

    first = np.mean([h["loss"] for h in history[:3]])
    last = np.mean([h["loss"] for h in history[-3:]])
    cfg_name = "RoMaConfig.tiny()" if args.config == "tiny" else "RoMaConfig() full dims"
    report = {
        "config": f"{cfg_name}, res {args.res}, batch {args.batch}, "
        f"{args.steps} DP steps on {args.devices} {args.platform} devices, "
        "full recipe (RobustLosses cls+Charbonnier+gating, two-group AdamW, "
        "warmup, MultiStep, clip 0.01, warmup-ramped EMA 0.995"
        + (", bf16+remat" if full else "") + ")",
        "loss_first3_logged": float(first),
        "loss_last3_logged": float(last),
        "eval_pck_before": pck0,
        "eval_pck_after": pck1,
        "eval_pck_after_ema": pck_ema,
        "eval_epe_px_before": epe0,
        "eval_epe_px_after": epe1,
        "grad_norm_last": history[-1]["grad_norm"],
        "bn_stats_finite": all(h["bn_stats_finite"] for h in history),
        "nonfinite_grad_steps": sum(1 for h in history if h["nonfinite_grads"] > 0),
        "wall_s": round(time.time() - t0, 1),
        "ok": bool(last < first and pck1["pck_5"] > pck0["pck_5"]),
    }
    with open(os.path.join(ROOT, f"CONVERGENCE_{args.tag}.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
