"""Weight download/caching contract (roma_tpu/models/zoo/download.py) and
the zoo constructors' partial-weight handling.

Reference behavior being mirrored: torch.hub.load_state_dict_from_url
(romatch/models/model_zoo/__init__.py:42-49) raises on failed/truncated
downloads; this repo additionally degrades gracefully to random init when
the environment has no egress at all.
"""
from __future__ import annotations

import io
import urllib.error

import pytest

from roma_tpu.models.zoo import download


class _FakeResponse:
    """Context-manager response yielding chunks, optionally failing mid-read."""

    def __init__(self, chunks, fail_after=None):
        self._chunks = list(chunks)
        self._fail_after = fail_after
        self._n = 0
        self.headers = {"Content-Length": str(sum(len(c) for c in chunks))}

    def read(self, _size):
        if self._fail_after is not None and self._n >= self._fail_after:
            raise ConnectionError("mid-transfer drop")
        self._n += 1
        return self._chunks[self._n - 1] if self._n <= len(self._chunks) else b""

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


@pytest.fixture(autouse=True)
def _reset(monkeypatch, tmp_path):
    monkeypatch.setattr(download, "_egress_ok", None)
    monkeypatch.setenv("ROMA_TPU_CACHE", str(tmp_path))
    monkeypatch.delenv("ROMA_TPU_OFFLINE", raising=False)


def test_fetch_connection_failure_degrades(monkeypatch):
    def raise_urlerror(*a, **kw):
        raise urllib.error.URLError("no dns")

    monkeypatch.setattr(download.urllib.request, "urlopen", raise_urlerror)
    assert download.fetch("http://x/y.pth", progress=False) is None
    assert not download.download_available()  # process marked offline
    # later calls skip straight to None without attempting
    monkeypatch.setattr(
        download.urllib.request, "urlopen",
        lambda *a, **kw: pytest.fail("should not retry after offline mark"),
    )
    assert download.fetch("http://x/z.pth", progress=False) is None


def test_fetch_mid_transfer_failure_raises(monkeypatch, tmp_path):
    """A download that already moved bytes must raise, never silently
    random-init — even on the FIRST download of the process."""
    monkeypatch.setattr(
        download.urllib.request, "urlopen",
        lambda *a, **kw: _FakeResponse([b"x" * 10, b"y" * 10], fail_after=1),
    )
    with pytest.raises(ConnectionError):
        download.fetch("http://x/w.pth", progress=False)
    assert not (tmp_path / "w.pth").exists()
    assert not (tmp_path / "w.pth.part").exists()


def test_fetch_success_and_cache(monkeypatch, tmp_path):
    monkeypatch.setattr(
        download.urllib.request, "urlopen",
        lambda *a, **kw: _FakeResponse([b"abc", b"def"]),
    )
    p = download.fetch("http://x/ok.pth", progress=False)
    assert p is not None and open(p, "rb").read() == b"abcdef"
    # cached: no second request
    monkeypatch.setattr(
        download.urllib.request, "urlopen",
        lambda *a, **kw: pytest.fail("cache hit expected"),
    )
    assert download.fetch("http://x/ok.pth", progress=False) == p


def test_partial_weight_pair_raises(monkeypatch):
    """One checkpoint of a pair available, companion missing -> loud error
    (silently random-initing a half-pretrained model is garbage)."""
    from roma_tpu.models import zoo

    monkeypatch.setenv("ROMA_TPU_OFFLINE", "1")
    with pytest.raises(RuntimeError, match="xfeat_weights unavailable"):
        zoo.tiny_roma_v1_outdoor(weights={"dummy": None})
    with pytest.raises(RuntimeError, match="dinov2_weights unavailable"):
        zoo.roma_outdoor(weights={"dummy": None})
