"""bonai_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the BONAI framework.

BONAI (reference: jwwangchn/BONAI, an mmdetection-v2.3 fork) trains LOFT —
a Mask R-CNN-style detector with a roof→footprint offset branch — on off-nadir
aerial imagery.  This package re-designs that stack TPU-first:

- static-shape, batched, masked detection core (no per-image python loops)
- flax.linen models compiled under a single pjit'd train step
- data parallelism via ``jax.sharding.Mesh`` + psum over ICI
- Pallas/XLA kernels for RoIAlign and NMS instead of CUDA extensions
- numpy/cv2 host input pipeline (the reference uses torch DataLoader workers)

Public surface mirrors the reference: python-file configs with ``_base_``
inheritance, string-typed registries, ``tools/train.py`` / ``tools/test.py``
CLIs, pkl/CSV eval artifacts.
"""

import os as _os

if "JAX_PLATFORMS" in _os.environ:
    # make the env var authoritative even when a site hook already
    # imported jax with a different platform pinned
    try:
        import jax as _jax
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:       # pragma: no cover - jax absent/locked
        pass

from .version import __version__
from .config import Config
from .registry import Registry, build_from_cfg

__all__ = ["__version__", "Config", "Registry", "build_from_cfg"]
