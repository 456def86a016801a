"""HRFPN neck (reference: ``mmdet/models/necks/hrfpn.py``) — concat all
HRNet branches at the highest resolution, 1x1 reduce, then stride-pool to
``num_outs`` pyramid levels with 3x3 output convs."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..backbones.hrnet import _upsample_to


class HRFPN(nn.Module):
    in_channels: Sequence[int] = (32, 64, 128, 256)
    out_channels: int = 256
    num_outs: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        h, w = inputs[0].shape[1], inputs[0].shape[2]
        ups = [inputs[0]] + [_upsample_to(x, h, w) for x in inputs[1:]]
        x = jnp.concatenate(ups, axis=-1)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name="reduction")(x)
        outs = []
        cur = x
        for i in range(self.num_outs):
            if i > 0:
                cur = nn.avg_pool(x, (2 ** i, 2 ** i),
                                  strides=(2 ** i, 2 ** i))
            outs.append(nn.Conv(self.out_channels, (3, 3),
                                padding=[(1, 1), (1, 1)], dtype=self.dtype,
                                name=f"fpn_conv{i}")(cur))
        return tuple(outs)
