# Test-time JAX platform setup: run every test on a virtual 8-device CPU mesh
# so multi-chip sharding logic is exercised without TPU hardware.
#
# NOTE: this image preloads jax at interpreter startup (site hook), so setting
# env vars here is too late for jax's import-time config read — but the XLA
# backend is not initialized yet, so jax.config.update still takes effect.
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
