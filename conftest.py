# Test-time JAX platform setup: run every test on a virtual 8-device CPU mesh
# so multi-chip sharding logic is exercised without TPU hardware.
#
# NOTE: this image preloads jax at interpreter startup (site hook), so setting
# env vars here is too late for jax's import-time config read — but the XLA
# backend is not initialized yet, so jax.config.update still takes effect.
import os

if not os.environ.get("ROMA_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
# hermetic tests: never attempt weight downloads (zoo/download.py)
os.environ["ROMA_TPU_OFFLINE"] = "1"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_llvm_disable_expensive_passes" not in _flags:
    # tests are compile-bound on this 1-core host; skip expensive LLVM opts
    _flags = (_flags + " --xla_llvm_disable_expensive_passes").strip()
os.environ["XLA_FLAGS"] = _flags

import jax

if os.environ.get("ROMA_TEST_TPU"):
    # opt-in hardware run (e.g. the Mosaic compiled-path lane_warp test):
    # keep the real TPU platform; mesh-shaped tests will fail/skip — run
    # targeted files only.
    pass
else:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# ---------------------------------------------------------------------------
# Test tiers: the default run is the fast tier (structural/tiny-config tests,
# op-level parity — completes in a few minutes on this 1-core box). Full-dim
# parity tests compile the ViT-L graph on XLA:CPU (minutes per program) and
# are opt-in: `pytest --runslow` (or ROMA_RUN_SLOW=1).
# ---------------------------------------------------------------------------
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run slow full-dimension parity tests",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-dim tests, opt-in via --runslow / ROMA_RUN_SLOW=1"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("ROMA_RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier: run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
