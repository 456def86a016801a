"""Force tests onto the CPU backend with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (the analog of the
reference's CPU-kernel fallback test strategy, SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
