"""Environment capture (reference: ``mmdet/utils/collect_env.py:15-65``)."""

from __future__ import annotations

import platform
import sys


def collect_env():
    env = {}
    env["sys.platform"] = sys.platform
    env["Python"] = sys.version.replace("\n", "")
    env["Platform"] = platform.platform()
    try:
        import jax
        env["JAX"] = jax.__version__
        env["jaxlib backend"] = jax.default_backend()
        env["Devices"] = ", ".join(str(d) for d in jax.devices())
    except Exception as e:      # pragma: no cover
        env["JAX"] = f"unavailable ({e})"
    for mod in ("flax", "optax", "numpy", "cv2"):
        try:
            m = __import__(mod)
            env[mod] = getattr(m, "__version__", "?")
        except ImportError:
            env[mod] = "missing"
    from ..version import __version__
    env["bonai_tpu"] = __version__
    return env


def env_info_str():
    return "\n".join(f"{k}: {v}" for k, v in collect_env().items())
