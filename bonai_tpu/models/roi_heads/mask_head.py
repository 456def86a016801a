"""FCN mask head.

reference: ``mmdet/models/roi_heads/mask_heads/fcn_mask_head.py:22-127`` —
``num_convs`` 3x3 convs, 2x deconv, 1x1 class logits.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class FCNMaskHead(nn.Module):
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (N, S, S, C) -> mask logits (N, 2S, 2S, num_classes)."""
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        for i in range(self.num_convs):
            x = nn.Conv(self.conv_out_channels, (3, 3),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        kernel_init=kaiming, name=f"conv{i}")(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(self.conv_out_channels, (2, 2), strides=(2, 2),
                             dtype=self.dtype, kernel_init=kaiming,
                             name="upsample")(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    kernel_init=kaiming, name="conv_logits")(x)
        return x.astype(jnp.float32)
