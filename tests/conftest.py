"""Test configuration: force an 8-device virtual CPU mesh (SURVEY.md §4.4).

The ambient environment registers an experimental TPU platform plugin that
overrides JAX_PLATFORMS at import time, so we must both set the env vars and
explicitly update jax.config before any backend is initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
_extra = []
if "xla_force_host_platform_device_count" not in flags:
    _extra.append("--xla_force_host_platform_device_count=8")
# XLA:CPU aborts the whole process when a collective participant misses the
# rendezvous by 40 s (default warn=20s/terminate=40s); on a loaded 1-CPU
# host the thread skew between the 8 virtual devices can exceed that.
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    _extra.append("--xla_cpu_collective_call_warn_stuck_timeout_seconds=300")
    _extra.append("--xla_cpu_collective_call_terminate_timeout_seconds=3600")
    _extra.append("--xla_cpu_collective_timeout_seconds=3600")
if _extra:
    os.environ["XLA_FLAGS"] = (flags + " " + " ".join(_extra)).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

# Persistent XLA compilation cache: repeat suite runs skip the expensive
# CPU compiles (the spatial/detection model tests dominate otherwise).
# Keyed by jaxlib version + CPU model + flags (cli/common.cache_fingerprint):
# XLA:CPU AOT results baked for another machine's target features SIGILL on
# execution, and the target tuning features follow the CPU *model*, not the
# raw flags (observed across a host change, MULTICHIP_r04).
from driving_dirty_tpu.cli.common import cache_fingerprint  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/dd_jax_cache_cpu_{cache_fingerprint()}")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
