"""Sharded benchmark equivalence: matching a pair batch sharded over the
ICI mesh must give the same results as unsharded single-device matching
(SURVEY.md §4 — a test the reference never had)."""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from roma_tpu.models.tiny import TinyRoMa
from roma_tpu.parallel.mesh import get_mesh, shard_batch


def test_tiny_match_sharded_equals_unsharded():
    model = TinyRoMa(TinyRoMa.init_variables(fast=True))
    rs = np.random.RandomState(0)
    im_A = rs.rand(8, 64, 64, 3).astype(np.float32)
    im_B = rs.rand(8, 64, 64, 3).astype(np.float32)

    warp_ref, cert_ref = model.match(im_A, im_B)

    mesh = get_mesh(8)
    sharded = shard_batch({"im_A": im_A, "im_B": im_B}, mesh)
    warp_sh, cert_sh = model.match(sharded["im_A"], sharded["im_B"])

    np.testing.assert_allclose(
        np.asarray(warp_sh), np.asarray(warp_ref), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(cert_sh), np.asarray(cert_ref), atol=2e-5
    )


def test_big_roma_match_sharded_equals_unsharded():
    """Big-RoMa two-pass symmetric match, pair batch sharded over the mesh
    (BASELINE config 4) vs unsharded — tiny config, real code path."""
    from roma_tpu.models.config import RoMaConfig
    from roma_tpu.models.roma import RegressionMatcher

    cfg = RoMaConfig.tiny()
    variables = RegressionMatcher.init_variables(res=56, config=cfg, fast=True)
    model = RegressionMatcher(
        variables, h=56, w=56, upsample_res=(64, 64), symmetric=True,
        upsample_preds=True, config=cfg,
    )
    rs = np.random.RandomState(1)
    im_A = rs.randn(8, 56, 56, 3).astype(np.float32)
    im_B = rs.randn(8, 56, 56, 3).astype(np.float32)

    warp_ref, cert_ref = model.match(im_A, im_B)

    mesh = get_mesh(8)
    sharded = shard_batch({"im_A": im_A, "im_B": im_B}, mesh)
    warp_sh, cert_sh = model.match(sharded["im_A"], sharded["im_B"])

    np.testing.assert_allclose(np.asarray(warp_sh), np.asarray(warp_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cert_sh), np.asarray(cert_ref), atol=1e-4)


def test_mega1500_batched_match_phase(tmp_path):
    """match_pairs_batched == per-pair path matching (same preprocessing),
    including the ragged final batch, with and without a mesh."""
    from PIL import Image

    from roma_tpu.benchmarks.pose_bench import PosePair, match_pairs_batched
    from roma_tpu.models.config import RoMaConfig
    from roma_tpu.models.roma import RegressionMatcher

    cfg = RoMaConfig.tiny()
    variables = RegressionMatcher.init_variables(res=56, config=cfg, fast=True)
    model = RegressionMatcher(
        variables, h=56, w=56, upsample_res=(64, 64), symmetric=True,
        upsample_preds=True, config=cfg,
    )
    rs = np.random.RandomState(2)
    pairs = []
    for i in range(3):
        pa, pb = tmp_path / f"a{i}.png", tmp_path / f"b{i}.png"
        Image.fromarray((rs.rand(50, 70, 3) * 255).astype(np.uint8)).save(pa)
        Image.fromarray((rs.rand(60, 40, 3) * 255).astype(np.uint8)).save(pb)
        K = np.eye(3)
        pairs.append(PosePair(str(pa), str(pb), K, K, np.eye(3), np.ones(3),
                              (50, 70), (60, 40)))

    ref = [model.match(p.im_A, p.im_B) for p in pairs]
    for mesh in (None, get_mesh(2)):
        out = list(match_pairs_batched(model, pairs, batch_size=2, mesh=mesh))
        assert len(out) == 3
        for (pair, warp, cert), (w_ref, c_ref) in zip(out, ref):
            np.testing.assert_allclose(np.asarray(warp), np.asarray(w_ref), atol=2e-4)
            np.testing.assert_allclose(np.asarray(cert), np.asarray(c_ref), atol=2e-4)
