"""Test config: force an 8-device virtual CPU platform BEFORE any jax
backend initialization so multi-chip sharding paths can be exercised without
TPU hardware. (The env-var route is unreliable here — the machine's axon
site customization overrides JAX_PLATFORMS — so we set the config directly.)
Set NL_TEST_ON_TPU=1 to run the suite on the real chip instead."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("NL_TEST_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

from nerf_lidar_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()
