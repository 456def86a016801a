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


class HTCMaskHead(nn.Module):
    """HTC mask head with information flow (reference
    ``mmdet/models/roi_heads/mask_heads/htc_mask_head.py``): a 1x1
    ``conv_res`` injects the previous stage's mask feature before the
    conv tower; callers may request the pre-upsample feature for the
    next stage."""
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, res_feat=None, return_logits=True,
                 return_feat=True):
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        if res_feat is not None:
            r = nn.Conv(self.conv_out_channels, (1, 1), dtype=self.dtype,
                        kernel_init=kaiming, name="conv_res")(res_feat)
            x = x + r
        for i in range(self.num_convs):
            x = nn.Conv(self.conv_out_channels, (3, 3),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        kernel_init=kaiming, name=f"conv{i}")(x)
            x = nn.relu(x)
        feat = x
        outs = []
        if return_logits:
            u = nn.ConvTranspose(self.conv_out_channels, (2, 2),
                                 strides=(2, 2), dtype=self.dtype,
                                 kernel_init=kaiming, name="upsample")(x)
            u = nn.relu(u)
            logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                             kernel_init=kaiming, name="conv_logits")(u)
            outs.append(logits.astype(jnp.float32))
        if return_feat:
            outs.append(feat)
        return outs[0] if len(outs) == 1 else tuple(outs)


class FusedSemanticHead(nn.Module):
    """HTC semantic branch (reference
    ``mmdet/models/roi_heads/mask_heads/fused_semantic_head.py``):
    lateral 1x1 convs on every FPN level resized-added onto
    ``fusion_level``, a conv tower, then a segmentation logit conv and
    an embedding conv whose output fuses into the RoI features."""
    num_ins: int = 5
    fusion_level: int = 1
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 183
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        import jax
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        target = feats[self.fusion_level]
        h, w = target.shape[1], target.shape[2]
        fused = nn.Conv(self.in_channels, (1, 1), dtype=self.dtype,
                        kernel_init=kaiming,
                        name=f"lateral{self.fusion_level}")(target)
        for i, f in enumerate(feats[:self.num_ins]):
            if i == self.fusion_level:
                continue
            lat = nn.Conv(self.in_channels, (1, 1), dtype=self.dtype,
                          kernel_init=kaiming, name=f"lateral{i}")(f)
            lat = jax.image.resize(lat, (lat.shape[0], h, w, lat.shape[3]),
                                   method="bilinear")
            fused = fused + lat
        x = fused
        for i in range(self.num_convs):
            x = nn.Conv(self.conv_out_channels, (3, 3),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        kernel_init=kaiming, name=f"conv{i}")(x)
            x = nn.relu(x)
        embedding = nn.relu(nn.Conv(self.conv_out_channels, (1, 1),
                                    dtype=self.dtype, kernel_init=kaiming,
                                    name="conv_embedding")(x))
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         kernel_init=kaiming, name="conv_logits")(x)
        return logits.astype(jnp.float32), embedding
