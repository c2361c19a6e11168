"""Pretrained-weight download + cache (reference
romatch/models/model_zoo/__init__.py:18-94 uses
``torch.hub.load_state_dict_from_url``; this is the torch-hub-free
equivalent: stdlib urllib into ``~/.cache/roma_tpu``).

The build/CI environment for this repo has no network egress, so every
entry point degrades gracefully: the first failed connection flips a
process-wide flag and later calls skip straight to the offline path
(random init) without re-paying the timeout.
"""
from __future__ import annotations

import os
import sys
import urllib.error
import urllib.request

_CACHE_ENV = "ROMA_TPU_CACHE"
_OFFLINE_ENV = "ROMA_TPU_OFFLINE"  # set to force-skip all downloads

#: None = unknown, True/False = result of the first real attempt
_egress_ok: bool | None = None


def cache_dir() -> str:
    return os.environ.get(_CACHE_ENV) or os.path.join(
        os.path.expanduser("~"), ".cache", "roma_tpu"
    )


def download_available() -> bool:
    """False once the env says offline or a first attempt failed."""
    if os.environ.get(_OFFLINE_ENV):
        return False
    return _egress_ok is not False


def fetch(url: str, *, progress: bool = True, timeout: float = 10.0) -> str | None:
    """Download ``url`` into the cache (atomic), return the local path.

    Returns the cached path immediately when present. Returns ``None``
    (after marking the process offline) when the network is unreachable;
    re-raises on mid-transfer errors so a truncated file is never kept.
    """
    global _egress_ok
    path = os.path.join(cache_dir(), url.rsplit("/", 1)[-1])
    if os.path.exists(path):
        return path
    if not download_available():
        return None
    os.makedirs(cache_dir(), exist_ok=True)
    tmp = path + ".part"
    done = 0
    try:
        req = urllib.request.Request(url, headers={"User-Agent": "roma-tpu"})
        with urllib.request.urlopen(req, timeout=timeout) as r, open(tmp, "wb") as f:
            total = int(r.headers.get("Content-Length") or 0)
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
                done += len(chunk)
                if progress and total:
                    print(
                        f"\r  {url.rsplit('/', 1)[-1]}: "
                        f"{done / 1e6:.0f}/{total / 1e6:.0f} MB",
                        end="",
                        file=sys.stderr,
                        flush=True,
                    )
        if progress:
            print(file=sys.stderr)
        os.replace(tmp, path)
        _egress_ok = True
        return path
    except (urllib.error.URLError, TimeoutError, ConnectionError, OSError) as e:
        if os.path.exists(tmp):
            os.remove(tmp)
        # Mid-transfer failure (bytes flowed THIS attempt) is a real error
        # the caller must see — silently falling back to random init after
        # a 90%-complete download would hand the user a garbage model.
        # Only a connection that never produced data means "offline".
        if done > 0 or _egress_ok:
            raise
        _egress_ok = False
        print(
            f"roma_tpu: weight download unavailable ({e}); "
            "models come up randomly initialized. Pass local checkpoint "
            "paths (weights=..., dinov2_weights=...) for pretrained runs.",
            file=sys.stderr,
        )
        return None
