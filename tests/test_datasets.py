"""Dataset + host transform tests (reference romatch/datasets/megadepth.py,
utils tuple transforms). Synthetic on-disk scene, no MegaDepth download."""
from __future__ import annotations

import os

import numpy as np
import pytest

from roma_tpu.datasets import transforms as T
from roma_tpu.datasets.megadepth import ConcatDataset, MegadepthBuilder, MegadepthScene


# --------------------------------------------------------------------------
# transforms
# --------------------------------------------------------------------------


def test_colorjiggle_preserves_shape_and_range():
    rng = np.random.RandomState(0)
    im = rng.rand(32, 48, 3).astype(np.float32)
    jiggle = T.ColorJiggle(brightness=0.3, contrast=0.3, saturation=0.3, hue=0.1)
    out = jiggle(rng, im)
    assert out.shape == im.shape and out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert not np.allclose(out, im)  # it actually did something


def test_colorjiggle_identity_when_disabled():
    rng = np.random.RandomState(0)
    im = rng.rand(16, 16, 3).astype(np.float32)
    jiggle = T.ColorJiggle(brightness=0, contrast=0, saturation=0, hue=0)
    np.testing.assert_allclose(jiggle(rng, im), im, atol=1e-6)


def test_rand_augment_pair_applies_same_ops():
    from PIL import Image

    rng = np.random.RandomState(1)
    arr = (np.random.RandomState(0).rand(40, 40, 3) * 255).astype(np.uint8)
    pil = Image.fromarray(arr)
    out_A, out_B = T.rand_augment_pair(rng, pil, pil.copy(), num_ops=2)
    # identical inputs + identical op sequence -> identical outputs
    np.testing.assert_array_equal(np.asarray(out_A), np.asarray(out_B))
    assert out_A.size == pil.size


# --------------------------------------------------------------------------
# synthetic MegadepthScene
# --------------------------------------------------------------------------


@pytest.fixture()
def synthetic_scene(tmp_path):
    import h5py
    from PIL import Image

    root = tmp_path
    os.makedirs(root / "imgs")
    os.makedirs(root / "depths")
    rs = np.random.RandomState(0)
    image_paths, depth_paths, intrinsics, poses = [], [], [], []
    for i in range(3):
        arr = (rs.rand(60, 80, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "imgs" / f"{i}.jpg")
        with h5py.File(root / "depths" / f"{i}.h5", "w") as f:
            f["depth"] = rs.rand(60, 80).astype(np.float32) * 10 + 1
        image_paths.append(f"imgs/{i}.jpg")
        depth_paths.append(f"depths/{i}.h5")
        intrinsics.append(np.array([[100, 0, 40], [0, 100, 30], [0, 0, 1]], np.float64))
        T_w2c = np.eye(4)
        T_w2c[:3, 3] = rs.rand(3)
        poses.append(T_w2c)
    scene_info = {
        "image_paths": image_paths,
        "depth_paths": depth_paths,
        "intrinsics": np.stack(intrinsics),
        "poses": np.stack(poses),
        "pairs": np.array([[0, 1], [1, 2], [0, 2]]),
        "overlaps": np.array([0.5, 0.4, 0.6]),
    }
    return root, scene_info


def test_megadepth_scene_getitem(synthetic_scene):
    root, scene_info = synthetic_scene
    scene = MegadepthScene(str(root), scene_info, ht=32, wt=48, min_overlap=0.3)
    assert len(scene) == 3
    item = scene[0]
    assert item["im_A"].shape == (32, 48, 3)
    assert item["im_A_depth"].shape == (32, 48)
    assert item["K1"].shape == (3, 3)
    # intrinsics rescaled to target size: fx scaled by wt/wi = 48/80
    assert np.isclose(item["K1"][0, 0], 100 * 48 / 80)
    assert item["T_1to2"].shape == (4, 4)


def test_megadepth_scene_overlap_filter(synthetic_scene):
    root, scene_info = synthetic_scene
    scene = MegadepthScene(str(root), scene_info, ht=32, wt=48, min_overlap=0.45)
    assert len(scene) == 2  # 0.5 and 0.6 pass, 0.4 filtered


def test_megadepth_scene_augs_run(synthetic_scene):
    root, scene_info = synthetic_scene
    scene = MegadepthScene(
        str(root), scene_info, ht=32, wt=48,
        shake_t=4,
        use_horizontal_flip_aug=True,
        random_eraser=T.RandomErasing(p=1.0),
        colorjiggle=T.ColorJiggle(),
        use_randaug=True,
    )
    item = scene[0]
    assert np.isfinite(item["im_A"]).all()
    assert item["im_A"].shape == (32, 48, 3)


def test_concat_and_weights(synthetic_scene):
    root, scene_info = synthetic_scene
    s1 = MegadepthScene(str(root), scene_info, ht=32, wt=48, min_overlap=0.3)
    s2 = MegadepthScene(str(root), scene_info, ht=32, wt=48, min_overlap=0.45)
    cat = ConcatDataset([s1, s2])
    assert len(cat) == 5
    w = MegadepthBuilder.weight_scenes(cat, alpha=0.75)
    assert w.shape == (5,)
    assert np.isclose(w[0], 1 / 3**0.75) and np.isclose(w[-1], 1 / 2**0.75)
    # indexing crosses the boundary correctly
    assert cat[4]["im_A"].shape == (32, 48, 3)
