"""Benchmark-loader fixture tests (VERDICT r4 item 7): the ScanNet-1500
TEST tree (test.npz + scans_test/.../intrinsic_color.txt walk) and the
HPatches sequence-directory walk, over byte-accurate miniature trees in the
real on-disk formats, so format drift fails here instead of on first contact
with real data.

Reference protocols pinned:
  - scannet_benchmark.py:16-75 — whole-4x4 intrinsic rescale to a 480 px
    short side (the reference scales the ENTIRE matrix, a quirk that is
    benign because estimate_pose only reads K[:2,:2] and K[:2,2]), the
    0.5 px pixel-center offset, and end-to-end pose recovery (oracle
    matches under the fixture's GT pose must score AUC ~1).
  - hpatches_sequences_homog_benchmark.py:11-113 — LoFTR ignore list,
    H_1_k text files, the [0, n-1] corner convention (-0.5 offset), and
    corner-warp error normalized to the 480 px scale.
"""
from __future__ import annotations

import os

import numpy as np
import pytest

from roma_tpu.benchmarks.hpatches import (
    HomogPair,
    HpatchesHomogBenchmark,
    corner_warp_error,
    load_hpatches_pairs,
)
from roma_tpu.benchmarks.scannet import ScanNetBenchmark, load_scannet_pairs

from fixtures_realformat import (
    HP_IGNORED_SEQ,
    make_hpatches_fixture,
    make_scannet1500_fixture,
)


@pytest.fixture(scope="module")
def scannet1500(tmp_path_factory):
    return make_scannet1500_fixture(tmp_path_factory.mktemp("scannet1500"))


@pytest.fixture(scope="module")
def hpatches(tmp_path_factory):
    return make_hpatches_fixture(tmp_path_factory.mktemp("hpatches"))


# ---------------------------------------------------------------------------
# ScanNet-1500 loader
# ---------------------------------------------------------------------------


def test_scannet1500_loader_over_fixture(scannet1500):
    root, truth = scannet1500
    pairs = load_scannet_pairs(root)
    assert len(pairs) == len(truth)
    # seeded shuffle: deterministic across runs
    again = load_scannet_pairs(root)
    assert [p.im_A for p in pairs] == [p.im_A for p in again]
    for pair in pairs:
        sid = int(os.path.basename(os.path.dirname(os.path.dirname(pair.im_A)))[
            len("scene0"):-len("_00")])
        t = truth[sid]
        w, h = t["wh"]
        s = 480 / min(w, h)
        # reference quirk: the WHOLE 4x4 is scaled (scannet_benchmark.py:74-75)
        np.testing.assert_allclose(pair.K1, t["K4"] * s)
        np.testing.assert_allclose(pair.K2, t["K4"] * s)
        np.testing.assert_allclose(pair.R, t["R"])
        np.testing.assert_allclose(pair.t, t["t"])
        assert pair.hw_A == (s * h, s * w)
        assert os.path.exists(pair.im_A) and os.path.exists(pair.im_B)
        stem_A = int(os.path.splitext(os.path.basename(pair.im_A))[0])
        assert stem_A == t["stems"][0]


class _PathKeyedModel:
    """Oracle matcher: a precomputed dense warp per im_A path."""

    def __init__(self, table):
        self._table = table  # path -> (warp, cert)

    def match(self, im_A, im_B):
        return self._table[im_A]

    def sample(self, warp, cert, num, key=None):
        w = np.asarray(warp).reshape(-1, 4)
        seed = 0 if key is None else int(np.asarray(key)[-1])
        idx = np.random.default_rng(seed).choice(len(w), size=num, replace=True)
        return w[idx], np.ones(num, np.float32)

    @staticmethod
    def to_pixel_coordinates(coords, H_A, W_A, H_B=None, W_B=None):
        coords = np.asarray(coords)
        tp = lambda c, h, w: np.stack(
            (w / 2 * (c[..., 0] + 1), h / 2 * (c[..., 1] + 1)), axis=-1
        )
        return tp(coords[..., :2], H_A, W_A), tp(coords[..., 2:], H_B, W_B)


def _scannet_oracle_warp(t, grid_h=40, grid_w=52, depth=5.0):
    """Exact dense warp under the fixture pose at the PROTOCOL-RESCALED
    resolution: pixels in A -> backproject at constant depth through the
    rescaled K -> transform by (R, t) -> project through the rescaled K in B.
    Normalized coords are chosen so the engine's to-pixel + the protocol's
    -0.5 offset land back on the K-convention coordinates exactly."""
    w, h = t["wh"]
    s = 480 / min(w, h)
    W, H = s * w, s * h
    fx = fy = t["K4"][0, 0] * s
    cx, cy = t["K4"][0, 2] * s, t["K4"][1, 2] * s
    # interior pixel grid in the rescaled-A frame (K convention)
    u = np.linspace(0.1 * W, 0.9 * W, grid_w)
    v = np.linspace(0.1 * H, 0.9 * H, grid_h)
    uu, vv = np.meshgrid(u, v, indexing="xy")
    X = (uu - cx) / fx * depth
    Y = (vv - cy) / fy * depth
    P = np.stack([X, Y, np.full_like(X, depth)], axis=-1) @ t["R"].T + t["t"]
    ub = fx * P[..., 0] / P[..., 2] + cx
    vb = fy * P[..., 1] / P[..., 2] + cy
    # engine: kpt = W/2*(xn+1) - 0.5  =>  xn = 2*(u_K + 0.5)/W - 1
    warp = np.stack(
        [
            2 * (uu + 0.5) / W - 1,
            2 * (vv + 0.5) / H - 1,
            2 * (ub + 0.5) / W - 1,
            2 * (vb + 0.5) / H - 1,
        ],
        axis=-1,
    ).astype(np.float32)
    return warp, np.ones((grid_h, grid_w), np.float32)


def test_scannet1500_benchmark_oracle_auc(scannet1500):
    """End-to-end over the real file layout: oracle matches under each
    pair's GT pose through the FULL loader + rescale + offset + estimator
    pipeline must recover the pose (ScanNet protocol incl. the
    double-counted final repeat)."""
    root, truth = scannet1500
    table = {}
    for pair in load_scannet_pairs(root):
        sid = int(os.path.basename(os.path.dirname(os.path.dirname(pair.im_A)))[
            len("scene0"):-len("_00")])
        table[pair.im_A] = _scannet_oracle_warp(truth[sid])
    model = _PathKeyedModel(table)
    summary = ScanNetBenchmark(root).benchmark(model)
    # noise-free correspondences: cv2 RANSAC recovers the pose nearly always
    assert summary["map_5"] >= 0.75, summary
    assert summary["auc_20"] > 0.6, summary


# ---------------------------------------------------------------------------
# HPatches loader
# ---------------------------------------------------------------------------


def test_hpatches_loader_over_fixture(hpatches):
    root, truth = hpatches
    seqs_path = os.path.join(root, "hpatches-sequences-release")
    pairs = load_hpatches_pairs(seqs_path)
    # 3 fixture sequences, one on the LoFTR ignore list -> 2 x 5 pairs
    assert len(pairs) == 10
    assert not any(HP_IGNORED_SEQ in p.im_A for p in pairs)
    # sorted sequence order, idx 2..6 within each
    names = [os.path.basename(os.path.dirname(p.im_A)) for p in pairs]
    assert names == sorted(names)
    for p in pairs:
        seq = os.path.basename(os.path.dirname(p.im_A))
        idx = int(os.path.splitext(os.path.basename(p.im_B))[0])
        H, wh_A, wh_B = truth[(seq, idx)]
        np.testing.assert_allclose(p.H_gt, H)
        assert p.wh_A == wh_A and p.wh_B == wh_B


def test_hpatches_corner_error_zero_at_gt(hpatches):
    root, truth = hpatches
    (seq, idx), (H, wh_A, wh_B) = next(iter(truth.items()))
    pair = HomogPair("a", "b", H, wh_A, wh_B)
    assert corner_warp_error(H, pair) < 1e-9
    # a pure 2 px x-shift on top of GT = 2 px corner error / 480-scale
    H_shift = np.array([[1, 0, 2.0], [0, 1, 0], [0, 0, 1.0]]) @ H
    expected = 2.0 / (min(wh_B) / 480.0)
    assert np.isclose(corner_warp_error(H_shift, pair), expected)


class _HomogOracleModel:
    """Oracle matcher whose matches satisfy pix_B = H(pix_A) in the HPatches
    [0, n-1] corner convention (pinning the benchmark's -0.5 offset)."""

    def __init__(self, truth):
        self._truth = truth

    def match(self, im_A, im_B):
        seq = os.path.basename(os.path.dirname(im_A))
        idx = int(os.path.splitext(os.path.basename(im_B))[0])
        H, (w1, h1), (w2, h2) = self._truth[(seq, idx)]
        u = np.linspace(0, w1 - 1, 48)
        v = np.linspace(0, h1 - 1, 36)
        uu, vv = np.meshgrid(u, v, indexing="xy")
        pts = np.stack([uu, vv, np.ones_like(uu)], axis=-1) @ H.T
        ub, vb = pts[..., 0] / pts[..., 2], pts[..., 1] / pts[..., 2]
        # benchmark _to_pixels: p = w*(x+1)/2 - 0.5  =>  x = 2*(p+0.5)/w - 1
        warp = np.stack(
            [
                2 * (uu + 0.5) / w1 - 1,
                2 * (vv + 0.5) / h1 - 1,
                2 * (ub + 0.5) / w2 - 1,
                2 * (vb + 0.5) / h2 - 1,
            ],
            axis=-1,
        ).astype(np.float64)
        return warp, np.ones(warp.shape[:2], np.float32)

    def sample(self, warp, cert, num, key=None):
        w = np.asarray(warp).reshape(-1, 4)
        idx = np.random.default_rng(0).choice(len(w), size=num, replace=True)
        return w[idx], np.ones(num, np.float32)


def test_hpatches_benchmark_oracle_auc(hpatches):
    root, truth = hpatches
    bench = HpatchesHomogBenchmark(root)
    summary = bench.benchmark(_HomogOracleModel(truth), sample_n=512)
    # exact correspondences -> findHomography recovers H -> corner error ~0
    assert summary["hpatches_homog_auc_3"] > 0.95, summary
    assert summary["hpatches_homog_auc_10"] > 0.95, summary
