"""Force tests onto the CPU backend with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (the analog of the
reference's CPU-kernel fallback test strategy, SURVEY.md §4).

NOTE: assignment (not setdefault) — the environment may pin
JAX_PLATFORMS to a hardware plugin globally, and jax may already be
imported by sitecustomize, so the config is also updated directly.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
