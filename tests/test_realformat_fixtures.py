"""Builders + loader + gt-warp over byte-accurate real-format fixture trees
(VERDICT r3 item 7). Any key/dtype/layout drift vs the reference's documented
on-disk formats (megadepth.py:24-47, scannet.py:22-60) fails here instead of
on first contact with real data."""
from __future__ import annotations

import numpy as np
import pytest

from roma_tpu.datasets.loader import DataLoader, weighted_sample_indices
from roma_tpu.datasets.megadepth import MegadepthBuilder
from roma_tpu.datasets.scannet import ScanNetBuilder
from roma_tpu.train.gt_warp import get_gt_warp

from fixtures_realformat import PLANE_DEPTH, TX, make_megadepth_fixture, make_scannet_fixture


@pytest.fixture(scope="module")
def mega_root(tmp_path_factory):
    return make_megadepth_fixture(tmp_path_factory.mktemp("megadepth"))


@pytest.fixture(scope="module")
def scannet_root(tmp_path_factory):
    return make_scannet_fixture(tmp_path_factory.mktemp("scannet"))


def _check_item(item, ht, wt):
    assert item["im_A"].shape == (ht, wt, 3)
    assert item["im_B"].shape == (ht, wt, 3)
    assert item["im_A_depth"].shape == (ht, wt)
    assert item["K1"].shape == (3, 3) and item["K1"].dtype == np.float32
    assert item["T_1to2"].shape == (4, 4) and item["T_1to2"].dtype == np.float32
    # ImageNet-normalized float32 images
    assert item["im_A"].dtype == np.float32
    assert -4 < item["im_A"].min() and item["im_A"].max() < 4


def test_megadepth_builder_over_fixture(mega_root):
    b = MegadepthBuilder(data_root=mega_root, loftr_ignore=True, imc21_ignore=True)
    scenes = b.build_scenes(split="train", min_overlap=0.3, ht=48, wt=64)
    assert len(scenes) == 1
    scene = scenes[0]
    assert len(scene) == 3  # all pairs pass min_overlap=0.3
    item = scene[0]
    _check_item(item, 48, 64)
    # intrinsics arrive FLAT (9,) float64 in real prep files: the reshape +
    # resize rescale must produce fx * wt/wi
    assert np.isclose(item["K1"][0, 0], 100.0 * 64 / 128)
    assert np.isclose(item["K1"][1, 1], 100.0 * 48 / 96)
    # overlap band filter
    assert len(b.build_scenes(split="train", min_overlap=0.5, ht=48, wt=64)[0]) == 2


def test_megadepth_gt_warp_over_fixture(mega_root):
    """The fixture geometry is a plane at Z=5 with camera B shifted by TX.
    The GT warp must equal the analytic pinhole reprojection (affine here,
    because the two fixture images have different native sizes and hence
    different rescaled intrinsics) — this also pins the pixel-center
    normalization convention of warp_kpts."""
    scene = MegadepthBuilder(data_root=mega_root).build_scenes(
        split="train", ht=48, wt=64
    )[0]
    item = scene[0]  # pair (0, 1): cam A at 0, cam B at TX
    batch = {k: np.asarray(v)[None] for k, v in item.items() if not isinstance(v, str)}
    H, W = 48, 64
    warp, prob = get_gt_warp(
        batch["im_A_depth"], batch["im_B_depth"], batch["T_1to2"],
        batch["K1"], batch["K2"], H=H, W=W,
    )
    warp, prob = np.asarray(warp)[0], np.asarray(prob)[0]
    assert prob.mean() > 0.5, "plane should be mostly covisible"
    K1, K2 = item["K1"], item["K2"]
    xn, yn = np.meshgrid(
        np.linspace(-1 + 1 / W, 1 - 1 / W, W),
        np.linspace(-1 + 1 / H, 1 - 1 / H, H),
        indexing="xy",
    )
    # normalized -> pixels -> plane point -> camera B -> normalized, in the
    # reference's [0.5, w-0.5] continuous-pixel convention (utils.py:402-404,
    # 434-436: x_px = w*(xn+1)/2, no half-pixel shift)
    x_px = (xn + 1) / 2 * W
    y_px = (yn + 1) / 2 * H
    X = (x_px - K1[0, 2]) / K1[0, 0] * PLANE_DEPTH
    Y = (y_px - K1[1, 2]) / K1[1, 1] * PLANE_DEPTH
    xb = K2[0, 0] * (X - TX) / PLANE_DEPTH + K2[0, 2]
    yb = K2[1, 1] * Y / PLANE_DEPTH + K2[1, 2]
    exp_x = 2 * xb / W - 1
    exp_y = 2 * yb / H - 1
    m = prob > 0.99
    assert m.sum() > 0
    np.testing.assert_allclose(warp[..., 0][m], exp_x[m], atol=2e-3)
    np.testing.assert_allclose(warp[..., 1][m], exp_y[m], atol=2e-3)


def test_megadepth_loader_over_fixture(mega_root):
    concat = MegadepthBuilder(data_root=mega_root).build_concat(
        split="train", ht=48, wt=64
    )
    weights = MegadepthBuilder.weight_scenes(concat, alpha=0.75)
    rng = np.random.RandomState(0)
    idx = weighted_sample_indices(rng, weights, 2)
    dl = DataLoader(concat, idx, batch_size=2, num_workers=2)
    batches = list(dl)
    assert len(batches) == 1
    assert batches[0]["im_A"].shape == (2, 48, 64, 3)
    assert np.isfinite(batches[0]["im_A_depth"]).all()


def test_scannet_builder_over_fixture(scannet_root):
    b = ScanNetBuilder(data_root=scannet_root)
    scenes = b.build_scenes(split="train", ht=48, wt=64)
    assert len(scenes) == 1
    scene = scenes[0]
    assert len(scene) == 2  # the stem-15 row is filtered (every-10th rule)
    item = scene[0]
    _check_item(item, 48, 64)
    # uint16 mm png -> meters
    assert np.isclose(item["im_A_depth"].max(), PLANE_DEPTH)
    # intrinsic_color.txt is 4x4; loader takes [:-1,:-1] then rescales
    assert np.isclose(item["K1"][0, 0], 100.0 * 64 / 128)
    # pose txts are cam2world; T_1to2 = w2c(B) @ inv(w2c(A)) must translate -TX
    assert np.isclose(item["T_1to2"][0, 3], -TX, atol=1e-6)


def test_scannet_gt_warp_over_fixture(scannet_root):
    scene = ScanNetBuilder(data_root=scannet_root).build_scenes(ht=48, wt=64)[0]
    item = scene[0]
    batch = {k: np.asarray(v)[None] for k, v in item.items()}
    warp, prob = get_gt_warp(
        batch["im_A_depth"], batch["im_B_depth"], batch["T_1to2"],
        batch["K1"], batch["K2"], H=48, W=64,
    )
    assert np.asarray(prob).mean() > 0.5
    assert np.isfinite(np.asarray(warp)).all()
