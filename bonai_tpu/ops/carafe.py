"""CARAFE — Content-Aware ReAssembly of FEatures (arXiv 1905.02188).

reference: mmcv ``ops/carafe.py`` (CARAFE CUDA kernel + CARAFEPack) as
used by ``mmdet/models/necks/fpn_carafe.py``.

TPU redesign: the CUDA kernel's per-output-pixel k x k gather becomes a
static loop over the k^2 shifts — each shift is a pad+slice of the
low-res map, nearest-upsampled and weighted by the predicted kernel
slice.  XLA fuses the k^2 multiply-adds into one elementwise pipeline;
nothing with dynamic shapes is materialised.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def carafe(feat, masks, up_kernel=5, scale=2):
    """Reassemble ``feat`` (B, H, W, C) into (B, sH, sW, C) using
    per-position kernels ``masks`` (B, sH, sW, k*k) (softmax-normalised
    over the last axis)."""
    B, H, W, C = feat.shape
    k = up_kernel
    r = k // 2
    padded = jnp.pad(feat, ((0, 0), (r, r), (r, r), (0, 0)))
    out = jnp.zeros((B, H * scale, W * scale, C), feat.dtype)
    for dy in range(k):
        for dx in range(k):
            shifted = padded[:, dy:dy + H, dx:dx + W, :]
            up = jnp.repeat(jnp.repeat(shifted, scale, axis=1),
                            scale, axis=2)
            w = masks[..., dy * k + dx][..., None].astype(feat.dtype)
            out = out + up * w
    return out


class CARAFEPack(nn.Module):
    """Kernel-prediction wrapper (mmcv ``CARAFEPack``): channel
    compressor -> content encoder -> pixel-shuffle -> softmax -> carafe.
    """
    channels: int
    scale_factor: int = 2
    up_kernel: int = 5
    up_group: int = 1          # kept for config parity (always 1 here)
    encoder_kernel: int = 3
    encoder_dilation: int = 1
    compressed_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        s, k = self.scale_factor, self.up_kernel
        c = nn.Conv(self.compressed_channels, (1, 1), dtype=self.dtype,
                    name="channel_compressor")(x)
        ek, d = self.encoder_kernel, self.encoder_dilation
        pad = d * (ek - 1) // 2
        m = nn.Conv(k * k * s * s, (ek, ek),
                    padding=[(pad, pad), (pad, pad)],
                    kernel_dilation=(d, d), dtype=self.dtype,
                    kernel_init=nn.initializers.normal(0.001),
                    name="content_encoder")(c)
        # pixel shuffle (k*k, s, s) channel layout -> (B, sH, sW, k*k)
        m = m.reshape(B, H, W, k * k, s, s)
        m = m.transpose(0, 1, 4, 2, 5, 3).reshape(B, H * s, W * s, k * k)
        m = jax.nn.softmax(m.astype(jnp.float32), axis=-1)
        return carafe(x, m, up_kernel=k, scale=s)
