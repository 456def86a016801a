"""BFP — Balanced Feature Pyramid (Libra R-CNN, arXiv 1904.02701).

reference: ``mmdet/models/necks/bfp.py`` — gather all levels to the
refine level (max-pool down / bilinear up), average, refine (conv or
non-local), scatter back with residual add.

TPU notes: adaptive_max_pool2d at exact 2^k ratios is a strided
reduce_window; bilinear resize is ``jax.image.resize`` (half-pixel
centers == F.interpolate align_corners=False).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _max_pool_to(x, th, tw):
    h, w = x.shape[1:3]
    kh, kw = h // th, w // tw
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, kh, kw, 1), (1, kh, kw, 1),
        "VALID")


class BFP(nn.Module):
    in_channels: int = 256
    num_levels: int = 5
    refine_level: int = 2
    refine_type: Any = None       # None | 'conv' | 'non_local'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == self.num_levels
        th, tw = inputs[self.refine_level].shape[1:3]
        gathered = []
        for i, x in enumerate(inputs):
            if i < self.refine_level:
                gathered.append(_max_pool_to(x, th, tw))
            elif i > self.refine_level:
                gathered.append(jax.image.resize(
                    x, (x.shape[0], th, tw, x.shape[3]), "bilinear"))
            else:
                gathered.append(x)
        bsf = sum(gathered) / len(gathered)

        if self.refine_type == "conv":
            bsf = nn.Conv(self.in_channels, (3, 3),
                          padding=[(1, 1), (1, 1)], dtype=self.dtype,
                          name="refine")(bsf)
        elif self.refine_type == "non_local":
            from ...ops.layers import NonLocal2d
            bsf = NonLocal2d(reduction=1, dtype=self.dtype,
                             name="refine")(bsf)

        outs = []
        for i, x in enumerate(inputs):
            h, w = x.shape[1:3]
            if i < self.refine_level:
                r = jax.image.resize(
                    bsf, (bsf.shape[0], h, w, bsf.shape[3]), "bilinear")
            elif i > self.refine_level:
                r = _max_pool_to(bsf, h, w)
            else:
                r = bsf
            outs.append(x + r.astype(x.dtype))
        return outs
