"""Test configuration: force an 8-device virtual CPU mesh (SURVEY.md §4.4).

The ambient environment registers an experimental TPU platform plugin that
overrides JAX_PLATFORMS at import time, so we must both set the env vars and
explicitly update jax.config before any backend is initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
