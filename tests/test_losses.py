"""Loss parity + behavior tests: big RobustLosses vs a torch executable spec,
tiny corr-volume loss invariants, transforms."""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from roma_tpu.train import RobustLosses, TinyRobustLosses


def _gm_cls_loss_torch(x2, prob, cls_logits, certainty):
    """Executable spec of robust_loss.py:43-61 (gm cls + certainty BCE)."""
    B, C, H, W = cls_logits.shape
    res = round(math.sqrt(C))
    G = torch.meshgrid(
        *[torch.linspace(-1 + 1 / res, 1 - 1 / res, steps=res) for _ in range(2)],
        indexing="ij",
    )
    G = torch.stack((G[1], G[0]), dim=-1).reshape(C, 2)
    GT = (G[None, :, None, None, :] - x2[:, None]).norm(dim=-1).min(dim=1).indices
    cls_loss = F.cross_entropy(cls_logits, GT, reduction="none")[prob > 0.99]
    cert_loss = F.binary_cross_entropy_with_logits(certainty[:, 0], prob)
    if not torch.any(cls_loss):
        cls_loss = cert_loss * 0.0
    return cls_loss.mean(), cert_loss


def _regression_loss_torch(x2, prob, flow, certainty, scale, alpha=0.5, c=1e-4):
    """Executable spec of robust_loss.py:82-100."""
    epe = (flow.permute(0, 2, 3, 1) - x2).norm(dim=-1)
    ce_loss = F.binary_cross_entropy_with_logits(certainty[:, 0], prob)
    cs = c * scale
    x = epe[prob > 0.99]
    reg = cs**alpha * ((x / cs) ** 2 + 1) ** (alpha / 2)
    if not torch.any(reg):
        reg = ce_loss * 0.0
    return reg.mean(), ce_loss


def test_gm_cls_loss_matches_torch():
    rs = np.random.RandomState(0)
    b, h, w, res = 2, 4, 4, 8
    c = res * res
    x2 = np.clip(rs.randn(b, h, w, 2) * 0.5, -1, 1).astype(np.float32)
    prob = (rs.rand(b, h, w) > 0.3).astype(np.float32)
    cls_logits = rs.randn(b, h, w, c).astype(np.float32)
    certainty = rs.randn(b, h, w, 1).astype(np.float32)

    rl = RobustLosses()
    cls_j, cert_j = rl.gm_cls_loss(
        jnp.asarray(x2), jnp.asarray(prob), jnp.asarray(cls_logits), jnp.asarray(certainty)
    )
    cls_t, cert_t = _gm_cls_loss_torch(
        torch.tensor(x2), torch.tensor(prob),
        torch.tensor(cls_logits).permute(0, 3, 1, 2), torch.tensor(certainty).permute(0, 3, 1, 2),
    )
    np.testing.assert_allclose(float(cls_j), float(cls_t), rtol=1e-4)
    np.testing.assert_allclose(float(cert_j), float(cert_t), rtol=1e-4)


def test_regression_loss_matches_torch():
    rs = np.random.RandomState(1)
    b, h, w = 2, 6, 6
    x2 = np.clip(rs.randn(b, h, w, 2) * 0.5, -1, 1).astype(np.float32)
    prob = (rs.rand(b, h, w) > 0.3).astype(np.float32)
    flow = np.clip(rs.randn(b, h, w, 2) * 0.5, -1, 1).astype(np.float32)
    certainty = rs.randn(b, h, w, 1).astype(np.float32)
    scale = 4

    rl = RobustLosses(alpha=0.5, c=1e-4)
    reg_j, cert_j, _ = rl.regression_loss(
        jnp.asarray(x2), jnp.asarray(prob), jnp.asarray(flow), jnp.asarray(certainty), scale
    )
    reg_t, cert_t = _regression_loss_torch(
        torch.tensor(x2), torch.tensor(prob),
        torch.tensor(flow).permute(0, 3, 1, 2), torch.tensor(certainty).permute(0, 3, 1, 2),
        scale,
    )
    np.testing.assert_allclose(float(reg_j), float(reg_t), rtol=1e-4)
    np.testing.assert_allclose(float(cert_j), float(cert_t), rtol=1e-4)


def test_tiny_corr_volume_loss_prefers_correct_matches():
    """The InfoNCE corr loss must be lower when the volume peaks on the GT
    mutual-nearest pairs than on random ones.

    NOTE: the loss reproduces the reference's index-order quirk
    (robust_loss_tiny_roma.py:50-61 indexes ``nll[b, i_A, j_B]`` against a
    volume whose axis 1 is B-pixels), so the rewarded cells in our
    query-major volume are the TRANSPOSED pair positions."""
    rs = np.random.RandomState(2)
    b, n = 1, 16
    mnn = np.zeros((b, n, n), bool)
    perm = rs.permutation(n)
    mnn[0, np.arange(n), perm] = True

    good = np.full((b, n, n), -1.0, np.float32)
    good[0, perm, np.arange(n)] = 2.0  # transposed cells (reference quirk)
    bad = rs.randn(b, n, n).astype(np.float32)

    tl = TinyRobustLosses()
    l_good = float(tl.corr_volume_loss(jnp.asarray(mnn), jnp.asarray(good)))
    l_bad = float(tl.corr_volume_loss(jnp.asarray(mnn), jnp.asarray(bad)))
    assert l_good < l_bad


def test_tiny_loss_full_runs():
    rs = np.random.RandomState(3)
    b, h, w = 2, 8, 8
    batch = {
        "im_A_depth": jnp.asarray(rs.rand(b, h, w).astype(np.float32) * 5 + 2),
        "im_B_depth": jnp.asarray(rs.rand(b, h, w).astype(np.float32) * 5 + 2),
        "T_1to2": jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))),
        "K1": jnp.asarray(
            np.tile(np.array([[50.0, 0, 4], [0, 50.0, 4], [0, 0, 1]], np.float32), (b, 1, 1))
        ),
        "K2": jnp.asarray(
            np.tile(np.array([[50.0, 0, 4], [0, 50.0, 4], [0, 0, 1]], np.float32), (b, 1, 1))
        ),
    }
    corresps = {
        8: {
            "flow": jnp.asarray(rs.randn(b, 4, 4, 2).astype(np.float32) * 0.1),
            "certainty": jnp.asarray(rs.randn(b, 4, 4, 1).astype(np.float32)),
            "corr_volume": jnp.asarray(rs.randn(b, 16, 16).astype(np.float32)),
        },
        4: {
            "flow": jnp.asarray(rs.randn(b, 8, 8, 2).astype(np.float32) * 0.1),
            "certainty": jnp.asarray(rs.randn(b, 8, 8, 1).astype(np.float32)),
        },
    }
    loss, metrics = TinyRobustLosses(epe_mask_prob_th=0.001)(corresps, batch)
    assert np.isfinite(float(loss))
    assert "gm_corr_volume_loss_8" in metrics


def test_perspective_transform_identity():
    from roma_tpu.datasets.transforms import random_perspective_matrix, warp_perspective

    rs = np.random.RandomState(0)
    x = rs.rand(20, 30, 3).astype(np.float32)
    out = warp_perspective(x, np.eye(3, dtype=np.float32))
    np.testing.assert_allclose(out, x, atol=1e-5)
    H = random_perspective_matrix(rs, 20, 30, distortion=0.1)
    assert H.shape == (3, 3) and abs(H[2, 2] - 1) < 1e-6
    warped = warp_perspective(x, H)
    assert warped.shape == x.shape and np.isfinite(warped).all()
