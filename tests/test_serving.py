"""MatchEngine (roma_tpu/serving.py): prefetch-overlapped batched matching.

Pins: input-order streaming, final-batch padding, equality with a direct
batched model.match on the same preprocessed arrays, and the on_host mode.
"""
from __future__ import annotations

import numpy as np
import pytest

from roma_tpu.models.zoo import roma_outdoor
from roma_tpu.serving import MatchEngine, _prep

A = "/root/reference/assets/sacre_coeur_A.jpg"
B = "/root/reference/assets/sacre_coeur_B.jpg"


@pytest.fixture(scope="module")
def small_model():
    return roma_outdoor(coarse_res=140, upsample_res=224)


@pytest.mark.slow  # two-pass big-model CPU compile (~4 min)
def test_match_engine_streams_in_order(small_model):
    import jax.numpy as jnp

    model = small_model
    pairs = [(A, B), (B, A), (A, A)]  # 3 pairs, batch 2 -> padded final batch
    engine = MatchEngine(model, batch_size=2, prefetch=2, workers=4)
    results = list(engine.match_paths(pairs, on_host=True))
    assert [r.index for r in results] == [0, 1, 2]
    assert all(isinstance(r.warp, np.ndarray) for r in results)

    # direct batched reference on the same preprocessed arrays
    coarse_hw = (model.h_resized, model.w_resized)
    up_hw = model.upsample_res
    for start in (0, 2):
        chunk = pairs[start : start + 2]
        padded = chunk + [chunk[-1]] * (2 - len(chunk))
        warp, cert = model.match(
            jnp.asarray(np.stack([_prep(p[0], coarse_hw) for p in padded]), model.dtype),
            jnp.asarray(np.stack([_prep(p[1], coarse_hw) for p in padded]), model.dtype),
            im_A_high_res=jnp.asarray(
                np.stack([_prep(p[0], up_hw) for p in padded]), model.dtype
            ),
            im_B_high_res=jnp.asarray(
                np.stack([_prep(p[1], up_hw) for p in padded]), model.dtype
            ),
        )
        for i, _ in enumerate(chunk):
            r = results[start + i]
            np.testing.assert_allclose(
                r.warp, np.asarray(warp[i]), atol=1e-6, rtol=0
            )
            np.testing.assert_allclose(
                r.certainty, np.asarray(cert[i]), atol=1e-6, rtol=0
            )


def test_match_engine_empty_and_validation(small_model):
    engine = MatchEngine(small_model, batch_size=2)
    assert list(engine.match_paths([])) == []
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:2])
    if len(devs) >= 2:
        mesh = Mesh(devs, ("data",))
        with pytest.raises(ValueError, match="must divide"):
            MatchEngine(small_model, batch_size=3, mesh=mesh)


def test_match_engine_tiny():
    """TinyRoMa through the engine: resize_hw + normalize=False mode."""
    import jax.numpy as jnp

    from roma_tpu.models.zoo import tiny_roma_v1_outdoor

    model = tiny_roma_v1_outdoor()
    engine = MatchEngine(model, batch_size=2, resize_hw=(224, 320),
                         normalize=False, workers=2)
    results = list(engine.match_paths([(A, B), (B, A), (A, A)], on_host=True))
    assert [r.index for r in results] == [0, 1, 2]

    # reference: direct batched match on the same prepped arrays
    arrs = [
        (_prep(a, (224, 320), False), _prep(b, (224, 320), False))
        for a, b in [(A, B), (B, A), (A, A)]
    ]
    for start in (0, 2):
        chunk = arrs[start : start + 2]
        padded = chunk + [chunk[-1]] * (2 - len(chunk))
        warp, cert = model.match(
            jnp.asarray(np.stack([p[0] for p in padded]), model.dtype),
            jnp.asarray(np.stack([p[1] for p in padded]), model.dtype),
        )
        for i in range(len(chunk)):
            np.testing.assert_allclose(
                results[start + i].warp, np.asarray(warp[i]), atol=1e-6, rtol=0
            )

    with pytest.raises(ValueError, match="resize_hw"):
        MatchEngine(model, batch_size=2)


def test_match_engine_error_paths(tmp_path):
    """Corrupt/mistyped inputs: raise mode names the pair; skip mode keeps
    the stream alive, preserves order, and never poisons the batch."""
    from roma_tpu.models.zoo import tiny_roma_v1_outdoor
    from roma_tpu.serving import MatchEngineError

    corrupt = tmp_path / "corrupt.jpg"
    corrupt.write_bytes(b"\xff\xd8\xff not actually a jpeg")

    model = tiny_roma_v1_outdoor()
    engine = MatchEngine(model, batch_size=2, resize_hw=(96, 128),
                         normalize=False, workers=2)

    with pytest.raises(MatchEngineError, match="pair 1 .*corrupt"):
        list(engine.match_paths([(A, B), (str(corrupt), B)]))

    # skip mode: pairs 0 and 2 share pair 1's batch and must still match
    results = list(
        engine.match_paths(
            [(A, B), (str(corrupt), B), (B, A), (A, "/nonexistent.jpg")],
            on_error="skip", on_host=True,
        )
    )
    assert [r.index for r in results] == [0, 1, 2, 3]
    assert results[0].error is None and results[0].warp is not None
    assert results[2].error is None and results[2].warp is not None
    assert results[1].warp is None and results[1].error is not None
    assert isinstance(results[3].error, FileNotFoundError)

    with pytest.raises(ValueError, match="on_error"):
        list(engine.match_paths([(A, B)], on_error="ignore"))


def test_match_engine_array_inputs():
    """HWC arrays, grayscale, and RGBA all normalize to RGB like the
    reference's convert('RGB') (matcher.py:530-547)."""
    from roma_tpu.models.zoo import tiny_roma_v1_outdoor
    from roma_tpu.serving import MatchEngineError

    rs = np.random.RandomState(0)
    rgb = rs.rand(64, 80, 3).astype(np.float32)
    gray = rgb.mean(-1)
    rgba = np.concatenate([rgb, np.ones((64, 80, 1), np.float32)], -1)

    model = tiny_roma_v1_outdoor()
    engine = MatchEngine(model, batch_size=2, resize_hw=(96, 128),
                         normalize=False, workers=2)
    results = list(engine.match_paths([(rgb, gray), (rgba, rgb)], on_host=True))
    assert [r.index for r in results] == [0, 1]
    assert all(r.error is None for r in results)

    with pytest.raises(MatchEngineError, match="pair 0"):
        list(engine.match_paths([(np.zeros((2, 3, 4, 5)), rgb)]))
