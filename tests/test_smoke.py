"""Construction smoke tests (reference tests/smoke_test.py:1-11).

Constructors run with the tiny config (random weights either way — no egress);
the full-size construction is covered by the slow-tier parity tests and the
driver's single-chip entry() compile check.
"""
from __future__ import annotations

import jax.numpy as jnp

import roma_tpu
from roma_tpu.models.config import RoMaConfig

TINY = RoMaConfig.tiny()


def test_roma_outdoor_constructs():
    model = roma_tpu.roma_outdoor(coarse_res=56, upsample_res=64, amp=False, config=TINY)
    assert model.h_resized == 56 and model.w_resized == 56
    assert model.get_output_resolution() == (64, 64)
    assert model.symmetric and model.upsample_preds


def test_roma_outdoor_default_resolutions():
    # don't init full-size weights here; just check the config plumbing
    import inspect

    from roma_tpu.models.zoo import roma_outdoor

    sig = inspect.signature(roma_outdoor)
    assert sig.parameters["coarse_res"].default == 560
    assert sig.parameters["upsample_res"].default == 864


def test_tiny_constructs():
    model = roma_tpu.tiny_roma_v1_outdoor()
    assert model.sample_thresh == 0.05
    assert model.sample_mode == "threshold_balanced"


def test_roma_indoor_constructs():
    model = roma_tpu.roma_indoor(coarse_res=56, upsample_res=64, amp=False, config=TINY)
    assert model.get_output_resolution() == (64, 64)


def test_weight_download_offline_fallback(monkeypatch, tmp_path):
    """zoo/download degrades gracefully with no egress: first failed fetch
    flips the process offline flag; cached files still resolve."""
    from roma_tpu.models.zoo import download

    monkeypatch.setenv("ROMA_TPU_CACHE", str(tmp_path))
    monkeypatch.delenv("ROMA_TPU_OFFLINE", raising=False)
    monkeypatch.setattr(download, "_egress_ok", None)
    # unroutable discard port -> fast connection failure on any host
    assert download.fetch("http://127.0.0.1:9/x.pth", timeout=0.5) is None
    assert download.download_available() is False
    # a cached file short-circuits even when offline
    cached = tmp_path / "y.pth"
    cached.write_bytes(b"x")
    assert download.fetch("http://127.0.0.1:9/y.pth") == str(cached)
    # env kill-switch
    monkeypatch.setenv("ROMA_TPU_OFFLINE", "1")
    monkeypatch.setattr(download, "_egress_ok", None)
    assert download.download_available() is False
