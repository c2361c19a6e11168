"""Parity of the v3 lane-packed windowed sampler (ops/lane_warp.py)
against grid_sample: miss fixups, fully-out-of-image zeros, over-budget
tile recompute, the whole-batch fallback, channel padding, and both
dtypes (bf16 row-block 16 / f32 row-block 8)."""
import numpy as np
import pytest

import jax.numpy as jnp

from roma_tpu.ops.grid_sample import grid_sample
from roma_tpu.ops.lane_warp import LaneSpec, lane_warp

SPEC = LaneSpec(th=8, tw=8, wh=16, xq=8, ns=3, pm=8, kf=8, nt_bad=4)


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
def test_lane_warp_matches_grid_sample(kind):
    h = w = 40
    b, c = 2, 5
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    flow = _flow(h, w, b, kind)
    ref = grid_sample(x, flow)
    got = lane_warp(x, flow, spec=SPEC, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("kind", ["smooth", "offimage", "speckle"])
def test_lane_warp_bf16(kind):
    """bf16 row-block (16): exact 0/1 selection of bf16 texels with f32
    combines — tolerance only for combine-order rounding."""
    h = w = 48
    b, c = 2, 9
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(b, h, w, c), jnp.bfloat16)
    flow = _flow(h, w, b, kind, seed=3)
    ref = grid_sample(x, flow)
    got = lane_warp(x, flow, spec=SPEC, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_lane_warp_rectangular_and_mismatched_grid():
    """Query grid resolution differing from the feature resolution."""
    b, c = 2, 4
    h, w = 48, 56
    hq, wq = 30, 26
    rs = np.random.RandomState(4)
    x = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    flow = _flow(hq, wq, b, "smooth", seed=5)
    ref = grid_sample(x, flow)
    got = lane_warp(x, flow, spec=SPEC, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_lane_warp_full_channel_width():
    """C = CP = 16: no channel pad at all."""
    h = w = 40
    b, c = 1, 16
    rs = np.random.RandomState(6)
    x = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    flow = _flow(h, w, b, "smooth", seed=7)
    ref = grid_sample(x, flow)
    got = lane_warp(x, flow, spec=SPEC, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_lane_warp_too_many_channels_falls_back():
    h = w = 40
    b, c = 1, 24  # > 128/xq: plain path
    rs = np.random.RandomState(8)
    x = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    flow = _flow(h, w, b, "smooth", seed=9)
    ref = grid_sample(x, flow)
    got = lane_warp(x, flow, spec=SPEC, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_lane_warp_small_image_falls_back():
    h = w = 12
    b, c = 1, 4
    rs = np.random.RandomState(10)
    x = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    flow = _flow(h, w, b, "smooth", seed=11)
    ref = grid_sample(x, flow)
    got = lane_warp(x, flow, spec=SPEC, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_lane_warp_compiled_production_spec_tpu():
    """Mosaic-COMPILED path with the production (default) LaneSpec on a
    small-but-legal shape (ADVICE r4 item 1): exercises the scalar-prefetch
    index_map, packed-i32 unpacking, DMA 128-divisibility and 16-bit slot
    ids that interpret=True cannot regress. Skipped off-TPU; run with

        ROMA_TEST_TPU=1 python -m pytest tests/test_lane_warp.py -k compiled
    """
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("Mosaic compile needs a TPU (set ROMA_TEST_TPU=1 so "
                    "conftest does not force the CPU platform)")
    h = w = 256
    b, c = 2, 9  # the production s1-up regime: bf16, C=9
    rs = np.random.RandomState(12)
    x = jnp.asarray(rs.randn(b, h, w, c), jnp.bfloat16)
    for kind in ("smooth", "offimage", "speckle"):
        flow = _flow(h, w, b, kind, seed=13)
        ref = grid_sample(x, flow)
        got = lane_warp(x, flow)  # default spec, compiled
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, err_msg=kind,
        )


WIDE_SPEC = LaneSpec(th=8, tw=8, wh=16, xq=2, ns=8, pm=8, kf=8, nt_bad=4)


@pytest.mark.parametrize("kind", ["smooth", "offimage", "speckle", "wild"])
def test_lane_warp_wide_channels(kind):
    """xq=2 wide-channel packing (cp=64): the s2-upsample x_hat regime."""
    h = w = 40
    b, c = 2, 64
    rs = np.random.RandomState(14)
    x = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    flow = _flow(h, w, b, kind, seed=15)
    ref = grid_sample(x, flow)
    got = lane_warp(x, flow, spec=WIDE_SPEC, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_lane_warp_wide_channels_partial_pad():
    """33 <= C < 64 pads to cp=64 and slices back."""
    h = w = 40
    b, c = 1, 40
    rs = np.random.RandomState(16)
    x = jnp.asarray(rs.randn(b, h, w, c), jnp.float32)
    flow = _flow(h, w, b, "smooth", seed=17)
    ref = grid_sample(x, flow)
    got = lane_warp(x, flow, spec=WIDE_SPEC, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_lane_warp_compiled_wide_spec_tpu():
    """Mosaic-compiled wide-channel production spec (_WIDE_C_SPEC) on a
    small-but-legal shape. Skipped off-TPU."""
    import jax

    from roma_tpu.ops.lane_warp import _WIDE_C_SPEC

    if jax.default_backend() != "tpu":
        pytest.skip("Mosaic compile needs a TPU (set ROMA_TEST_TPU=1 so "
                    "conftest does not force the CPU platform)")
    h = w = 256
    b, c = 2, 64  # the production s2-up regime: bf16, C=64
    rs = np.random.RandomState(18)
    x = jnp.asarray(rs.randn(b, h, w, c), jnp.bfloat16)
    for kind in ("smooth", "offimage", "speckle"):
        flow = _flow(h, w, b, kind, seed=19)
        ref = grid_sample(x, flow)
        got = lane_warp(x, flow, spec=_WIDE_C_SPEC)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, err_msg=kind,
        )
