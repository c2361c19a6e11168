"""Benchmark-utility tests: pose AUC math, pose estimation on synthetic
geometry (cv2 + native backends), dense benchmark geometric distance."""
from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from roma_tpu.benchmarks import (
    compute_pose_error,
    compute_relative_pose,
    estimate_pose,
    pose_auc,
)
from roma_tpu.benchmarks.mega_dense import _geometric_dist


def test_pose_auc_extremes():
    assert pose_auc(np.zeros(100), [5, 10, 20]) == pytest.approx([1.0, 1.0, 1.0], abs=0.02)
    aucs = pose_auc(np.full(100, 180.0), [5, 10, 20])
    assert max(aucs) < 0.01
    # half the poses perfect, half terrible -> ~0.5
    aucs = pose_auc(np.concatenate([np.zeros(50), np.full(50, 180.0)]), [10])
    assert 0.4 < aucs[0] < 0.6


def _synthetic_two_view(n=500, seed=0, noise=0.3):
    rs = np.random.RandomState(seed)
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    X = np.stack(
        [rs.uniform(-2, 2, n), rs.uniform(-1.5, 1.5, n), rs.uniform(4, 10, n)], -1
    )
    ang = 0.2
    R = np.array(
        [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]]
    )
    t = np.array([0.6, 0.05, 0.1])
    X2 = X @ R.T + t
    p1 = (X / X[:, 2:]) @ K.T
    p2 = (X2 / X2[:, 2:]) @ K.T
    return (
        p1[:, :2] + rs.randn(n, 2) * noise,
        p2[:, :2] + rs.randn(n, 2) * noise,
        K,
        R,
        t,
    )


def test_estimate_pose_cv2_synthetic():
    k1, k2, K, R_gt, t_gt = _synthetic_two_view()
    norm_thresh = 0.5 / (np.mean(np.abs(K[:2, :2])) * 2)
    ret = estimate_pose(k1, k2, K, K, norm_thresh)
    assert ret is not None
    R, t, mask = ret
    T = np.concatenate([R, t], axis=-1)
    e_t, e_R = compute_pose_error(T, R_gt, t_gt)
    # translation direction is the noise-sensitive part of E decomposition
    assert e_R < 1.5 and e_t < 8.0


def test_compute_relative_pose_identity():
    R1 = np.eye(3)
    t1 = np.zeros(3)
    R2 = np.eye(3)
    t2 = np.array([1.0, 0, 0])
    R, t = compute_relative_pose(R1, t1, R2, t2)
    np.testing.assert_allclose(R, np.eye(3))
    np.testing.assert_allclose(t, t2)


def test_dense_geometric_dist_identity():
    """Identity transform + GT warp == predicted warp -> EPE 0, PCK 1."""
    b, h, w = 2, 16, 16
    rs = np.random.RandomState(0)
    depth = (rs.rand(b, h, w) * 5 + 2).astype(np.float32)
    K = np.tile(
        np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32),
        (b, 1, 1),
    )
    T = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    from roma_tpu.ops import batched_grid

    grid = np.asarray(batched_grid(b, h, w))
    matches = np.concatenate([grid, grid], axis=-1)  # identity warp
    gd, pck1, pck3, pck5 = _geometric_dist(
        jnp.asarray(depth), jnp.asarray(depth), jnp.asarray(T),
        jnp.asarray(K), jnp.asarray(K), jnp.asarray(matches), h1=h, w1=w,
    )
    assert float(gd) < 0.05
    assert float(pck1) > 0.99
