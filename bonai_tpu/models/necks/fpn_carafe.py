"""FPN with CARAFE upsampling (arXiv 1905.02188).

reference: ``mmdet/models/necks/fpn_carafe.py`` — FPN whose top-down
2x upsample is a CARAFEPack per merge step; extra levels come from
stride-2 lateral convs chained off the last backbone level.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.carafe import CARAFEPack


class FPN_CARAFE(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    up_kernel: int = 5
    encoder_kernel: int = 3
    encoder_dilation: int = 1
    compressed_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        c = self.out_channels
        n_backbone = len(self.in_channels) - self.start_level
        laterals = []
        for i in range(n_backbone):
            laterals.append(nn.Conv(
                c, (1, 1), dtype=self.dtype,
                name=f"lateral{i}")(inputs[i + self.start_level]))
        # extra levels: stride-2 3x3 convs chained from the last input /
        # previous lateral (reference fpn_carafe.py:140-200)
        for i in range(self.num_outs - n_backbone):
            src = inputs[-1] if i == 0 else laterals[-1]
            laterals.append(nn.Conv(
                c, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                dtype=self.dtype, name=f"extra_lateral{i}")(src))

        # top-down with CARAFE upsamplers
        for i in range(len(laterals) - 1, 0, -1):
            up = CARAFEPack(
                channels=c, scale_factor=2, up_kernel=self.up_kernel,
                encoder_kernel=self.encoder_kernel,
                encoder_dilation=self.encoder_dilation,
                compressed_channels=self.compressed_channels,
                dtype=self.dtype, name=f"upsample{i - 1}")(laterals[i])
            th, tw = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + up[:, :th, :tw, :]

        return [nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name=f"fpn_conv{i}")(v)
                for i, v in enumerate(laterals)]
