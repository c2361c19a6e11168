"""Golden-metric regression against the reference's published constants.

These are the authoritative quality bars of the reference repo
(/root/reference/tests/test_mega1500.py:17-22, tests/test_mega_dense.py:16-22),
asserted at the reference's own tolerances. They need the released weights and
MegaDepth data, neither of which can be downloaded in this environment — the
tests skip cleanly unless:

  ROMA_WEIGHTS      = path to roma_outdoor.pth
  DINOV2_WEIGHTS    = path to dinov2_vitl14_pretrain.pth
  MEGADEPTH_ROOT    = MegaDepth root with the scene .npz files +
                      prep_scene_info/ (defaults to data/megadepth)

Run: ROMA_WEIGHTS=... DINOV2_WEIGHTS=... MEGADEPTH_ROOT=... \
     pytest tests/test_golden_metrics.py -q
"""
from __future__ import annotations

import os

import numpy as np
import pytest

ROMA_WEIGHTS = os.environ.get("ROMA_WEIGHTS")
DINOV2_WEIGHTS = os.environ.get("DINOV2_WEIGHTS")
MEGADEPTH_ROOT = os.environ.get("MEGADEPTH_ROOT", "data/megadepth")

_have_weights = bool(ROMA_WEIGHTS and DINOV2_WEIGHTS)
_have_mega1500 = os.path.exists(os.path.join(MEGADEPTH_ROOT, "0015_0.1_0.3.npz"))
_have_scenes = os.path.isdir(os.path.join(MEGADEPTH_ROOT, "prep_scene_info"))

pytestmark = pytest.mark.skipif(
    not _have_weights,
    reason="golden-metric tests need ROMA_WEIGHTS + DINOV2_WEIGHTS env paths",
)

# reference tests/test_mega1500.py:17-19 (py3.12 / torch 2.8.0 env)
MEGA1500_AUC = (0.6271474434923545, 0.7673889435429945, 0.8642099162282599)
# reference tests/test_mega_dense.py:16-22
MEGA_DENSE = {
    "epe": 1.581197752074192,
    "mega_pck_1": 0.8516846923828125,
    "mega_pck_3": 0.9566336059570313,
    "mega_pck_5": 0.9714825439453125,
}


@pytest.mark.skipif(not _have_mega1500, reason="Mega-1500 scene .npz files absent")
def test_mega1500_auc_parity():
    from roma_tpu.benchmarks import MegaDepthPoseEstimationBenchmark
    from roma_tpu.models.zoo import roma_outdoor

    # reference golden config: coarse 672, upsample 1344
    model = roma_outdoor(
        weights=ROMA_WEIGHTS, dinov2_weights=DINOV2_WEIGHTS,
        coarse_res=672, upsample_res=1344,
    )
    results = MegaDepthPoseEstimationBenchmark(MEGADEPTH_ROOT).benchmark(model)
    print(results)
    assert np.isclose(results["auc_5"], MEGA1500_AUC[0], atol=0.5 / 100)
    assert np.isclose(results["auc_10"], MEGA1500_AUC[1], atol=0.5 / 100)
    assert np.isclose(results["auc_20"], MEGA1500_AUC[2], atol=0.5 / 100)


@pytest.mark.skipif(not _have_scenes, reason="MegaDepth prep_scene_info absent")
def test_mega_dense_parity():
    from roma_tpu.benchmarks import MegadepthDenseBenchmark
    from roma_tpu.models.zoo import roma_outdoor

    # reference golden config: 560 coarse only, asymmetric, no upsample
    model = roma_outdoor(
        weights=ROMA_WEIGHTS, dinov2_weights=DINOV2_WEIGHTS,
        coarse_res=560, symmetric=False, upsample_preds=False,
    )
    results = MegadepthDenseBenchmark(MEGADEPTH_ROOT, h=560, w=560).benchmark(model)
    print(results)
    assert np.isclose(results["epe"], MEGA_DENSE["epe"], atol=1e-1)
    assert np.isclose(results["mega_pck_1"], MEGA_DENSE["mega_pck_1"], atol=0.5 / 100)
    assert np.isclose(results["mega_pck_3"], MEGA_DENSE["mega_pck_3"], atol=0.5 / 100)
    assert np.isclose(results["mega_pck_5"], MEGA_DENSE["mega_pck_5"], atol=0.5 / 100)
