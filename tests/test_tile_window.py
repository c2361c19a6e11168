"""Parity of the v2 windowed tile sampler (ops/tile_window.py) against
grid_sample, including miss fixups, fully-out-of-image zeros, over-budget
tile recompute, and the whole-batch fallback path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roma_tpu.ops.grid_sample import grid_sample
from roma_tpu.ops.tile_window import WarpSpec, windowed_warp

SPEC = WarpSpec(th=8, tw=8, wh=16, xq=8, ns=3, pm=4, kf=8, nt_bad=4)


def _flow(h, w, b, kind, seed=0):
    rs = np.random.RandomState(seed)
    gy, gx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij")
    f = np.stack([gx, gy], -1)[None].repeat(b, 0)
    if kind == "smooth":
        f = f + 0.05 * rs.randn(b, h, w, 2)
    elif kind == "offimage":
        f = f + 0.05 * rs.randn(b, h, w, 2)
        f[:, : h // 3] -= 3.0  # top band fully out of image
    elif kind == "speckle":
        f = f + 0.03 * rs.randn(b, h, w, 2)
        sp = rs.rand(b, h, w) < 0.05
        f[..., 0] += np.where(sp, rs.randn(b, h, w), 0.0)
        f[..., 1] += np.where(sp, rs.randn(b, h, w), 0.0)
    elif kind == "wild":
        f = 2.5 * rs.randn(b, h, w, 2)  # overflows every budget -> fallback
    return jnp.asarray(f, jnp.float32)


@pytest.mark.parametrize("kind", ["smooth", "offimage", "speckle", "wild"])
@pytest.mark.parametrize("dots", ["f32", "bf16x2"])
def test_windowed_warp_matches_grid_sample(kind, dots):
    h = w = 40
    b, c = 2, 5
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    flow = _flow(h, w, b, kind)
    spec = WarpSpec(**{**SPEC.__dict__, "dots": dots})
    ref = grid_sample(x, flow)
    got = windowed_warp(x, flow, spec=spec, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_windowed_warp_bf16_matches_grid_sample_bf16():
    h = w = 40
    b, c = 2, 9
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(b, h, w, c), jnp.bfloat16)
    flow = _flow(h, w, b, "offimage", seed=3)
    ref = grid_sample(x, flow)
    got = windowed_warp(x, flow, spec=SPEC, interpret=True)
    # identical f32 accumulation on bf16 inputs -> tight tolerance
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_windowed_warp_rectangular_and_mismatched_grid():
    """Query grid resolution differing from the feature resolution."""
    b, c = 2, 4
    h, w = 48, 56
    hq, wq = 30, 26
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    flow = _flow(hq, wq, b, "smooth", seed=5)
    ref = grid_sample(x, flow)
    got = windowed_warp(x, flow, spec=SPEC, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_small_image_falls_back_to_plain():
    b, c, h, w = 1, 3, 10, 10
    rs = np.random.RandomState(6)
    x = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    flow = _flow(h, w, b, "smooth", seed=7)
    got = windowed_warp(x, flow, spec=SPEC, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(grid_sample(x, flow)), atol=1e-5, rtol=1e-5
    )


# ---------------------------------------------------------------------------
# windowed local correlation
# ---------------------------------------------------------------------------

def _cspec(**kw):
    from roma_tpu.ops.tile_window import CorrSpec

    base = dict(th=8, tw=8, wh=24, xq=8, ns=4, pm=8, kf=4, nt_bad=8, cc=8)
    base.update(kw)
    return CorrSpec(**base)


@pytest.mark.parametrize("kind", ["smooth", "offimage", "speckle", "wild"])
@pytest.mark.parametrize("radius", [1, 2])
def test_windowed_local_corr_matches_reference(kind, radius):
    from roma_tpu.ops.local_corr import local_correlation
    from roma_tpu.ops.tile_window import windowed_local_corr

    b, h, w, c = 2, 40, 40, 24  # c = 3 chunks of cc=8
    rs = np.random.RandomState(radius)
    f0 = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    f1 = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    flow = _flow(h, w, b, kind, seed=radius)
    ref = local_correlation(f0, f1, radius, flow, method="patch")
    got = windowed_local_corr(
        f0, f1, radius, flow, spec=_cspec(), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3
    )


def test_windowed_local_corr_channel_pad():
    """C not a multiple of the chunk: zero-padded channels must not change
    the dots."""
    from roma_tpu.ops.local_corr import local_correlation
    from roma_tpu.ops.tile_window import windowed_local_corr

    b, h, w, c = 1, 40, 40, 13
    rs = np.random.RandomState(0)
    f0 = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    f1 = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    flow = _flow(h, w, b, "smooth", seed=9)
    ref = local_correlation(f0, f1, 2, flow, method="patch")
    got = windowed_local_corr(f0, f1, 2, flow, spec=_cspec(), interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3
    )


def test_windowed_local_corr_small_image_fallback():
    from roma_tpu.ops.local_corr import local_correlation
    from roma_tpu.ops.tile_window import windowed_local_corr

    b, h, w, c = 1, 12, 12, 8
    rs = np.random.RandomState(3)
    f0 = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    f1 = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    flow = _flow(h, w, b, "smooth", seed=11)
    ref = local_correlation(f0, f1, 2, flow, method="patch")
    got = windowed_local_corr(f0, f1, 2, flow, spec=_cspec(), interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3
    )
