"""Cross-implementation end-to-end AUC equivalence (VERDICT r4 item 1).

The composed parity capstone: the independently written torch spec and the
JAX model — identical converted weights, identical GT-geometry logit bias —
through the IDENTICAL match -> sample -> RANSAC -> AUC pipeline on synthetic
full-dims scenes, asserted at the reference's own reproduction tolerance
(0.5 pp AUC; reference README.md:151). Machinery: tools/crossimpl_auc.py.

Cost note (1-core CPU CI): the 560->864 case is ~1 h (full-dims torch
forward + XLA:CPU f32 compile), run in the slow tier; the 672->1344 golden
config multiplies that by ~4 and is opt-in via ROMA_RUN_XSLOW=1 — its last
real run is recorded in CROSSIMPL_AUC.json at the repo root.
"""
from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.mark.slow
@pytest.mark.parametrize(
    "coarse,up",
    [
        (560, 864),
        pytest.param(
            672, 1344,
            marks=pytest.mark.skipif(
                not os.environ.get("ROMA_RUN_XSLOW"),
                reason="golden-config cross-impl run is ~4 h on 1-core CPU; "
                "ROMA_RUN_XSLOW=1 opts in (last real run: CROSSIMPL_AUC.json)",
            ),
        ),
    ],
)
def test_crossimpl_auc_equivalence(coarse, up):
    from crossimpl_auc import run_crossimpl

    report = run_crossimpl(
        coarse, up, n_scenes=2, repeats=2, sample_n=2000,
        cache_dir=f"/tmp/crossimpl_test_{coarse}", verbose=True,
    )
    # the two implementations' composed benchmark numbers agree at the
    # reference's reproduction bar
    assert report["max_delta_pp"] <= 0.5, report
    # and the number is non-degenerate (the pipeline recovered real poses,
    # so the equality is not 0 == 0)
    assert report["auc_jax"]["auc_20"] > 0.2, report


def test_crossimpl_geometry_exact():
    """Fast tier self-check of the synthetic scenes: ray-cast warps must
    round-trip and satisfy the epipolar constraint to machine precision."""
    import numpy as np

    from crossimpl_auc import gt_warp, make_scene

    for i in range(3):
        s = make_scene(i, (864, 864))
        g = np.linspace(-0.9, 0.9, 15)
        pts = np.stack(np.meshgrid(g, g, indexing="ij"), -1).reshape(-1, 2)
        w_ab = gt_warp(s, pts, "AtoB")
        back = gt_warp(s, w_ab, "BtoA")
        assert np.abs(back - pts).max() < 1e-9
        tx = np.array([
            [0, -s.t[2], s.t[1]], [s.t[2], 0, -s.t[0]], [-s.t[1], s.t[0], 0]
        ])
        E = tx @ s.R
        h, w = s.hw_A
        ones = np.ones((len(pts), 1))
        p1 = np.concatenate([(pts + 1) * [[w / 2, h / 2]], ones], -1) @ np.linalg.inv(s.K1).T
        p2 = np.concatenate([(w_ab + 1) * [[w / 2, h / 2]], ones], -1) @ np.linalg.inv(s.K2).T
        assert np.abs(np.einsum("ni,ij,nj->n", p2, E, p1)).max() < 1e-12
