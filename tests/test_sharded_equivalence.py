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
