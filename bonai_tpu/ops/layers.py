"""Stretch native-op equivalents from the reference's mmcv dependency
(SURVEY §2.9): weight-standardised conv, non-local block, GCNet context
block, corner pooling, masked conv.

reference: ``mmcv.ops`` / ``mmcv.cnn`` as imported by
``mmdet/ops/__init__.py:5-32`` — CUDA/C++ there, pure XLA here (they are
all elementwise/matmul/cummax shapes the compiler fuses natively; none
needs a Pallas kernel).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def conv_ws_2d(x, kernel, bias=None, stride=1, padding=1, eps=1e-5):
    """Weight-standardised conv (reference ``mmcv.cnn.conv_ws_2d`` /
    ``ConvWS2d``; arXiv 1903.10520): the kernel is z-scored over
    (kh, kw, cin) per output channel before the convolution.

    kernel: ``(kh, kw, cin, cout)`` (flax layout).
    """
    mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
    std = jnp.std(kernel, axis=(0, 1, 2), keepdims=True)
    k = (kernel - mean) / (std + eps)
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias
    return out


class ConvWS2d(nn.Module):
    """Module wrapper over :func:`conv_ws_2d` (used by gn+ws configs)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (self.kernel_size, self.kernel_size, x.shape[-1],
             self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32) \
            if self.use_bias else None
        return conv_ws_2d(x.astype(self.dtype), k.astype(self.dtype),
                          None if b is None else b.astype(self.dtype),
                          self.stride, self.kernel_size // 2, self.eps)


class NonLocal2d(nn.Module):
    """Embedded-Gaussian non-local block (reference ``mmcv.cnn.NonLocal2d``
    as used by the empirical-attention/GCNet configs; arXiv 1711.07971):
    ``out = x + conv_out(softmax(theta xT phi x) g(x))``."""
    reduction: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        inter = max(c // self.reduction, 1)
        init = nn.initializers.normal(0.01)
        theta = nn.Conv(inter, (1, 1), dtype=self.dtype, kernel_init=init,
                        name="theta")(x).reshape(b, h * w, inter)
        phi = nn.Conv(inter, (1, 1), dtype=self.dtype, kernel_init=init,
                      name="phi")(x).reshape(b, h * w, inter)
        g = nn.Conv(inter, (1, 1), dtype=self.dtype, kernel_init=init,
                    name="g")(x).reshape(b, h * w, inter)
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", theta, phi).astype(jnp.float32),
            axis=-1).astype(x.dtype)
        y = jnp.einsum("bnm,bmc->bnc", attn, g).reshape(b, h, w, inter)
        # conv_out zero-init: the block starts as identity (reference)
        y = nn.Conv(c, (1, 1), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros,
                    name="conv_out")(y)
        return x + y


class ContextBlock(nn.Module):
    """GCNet global-context block (reference ``mmcv.cnn.ContextBlock``;
    arXiv 1904.11492): softmax spatial pooling + bottleneck channel
    transform, fused back additively (zero-init → identity at start)."""
    ratio: float = 1. / 16
    pooling_type: str = "att"          # 'att' | 'avg'
    fusion_types: tuple = ("channel_add",)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        planes = max(int(c * self.ratio), 1)
        if self.pooling_type == "att":
            logits = nn.Conv(1, (1, 1), dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name="conv_mask")(x).reshape(b, h * w)
            attn = jax.nn.softmax(logits.astype(jnp.float32),
                                  axis=-1).astype(x.dtype)
            context = jnp.einsum("bn,bnc->bc", attn,
                                 x.reshape(b, h * w, c))
        else:
            context = jnp.mean(x, axis=(1, 2))
        context = context[:, None, None, :]             # (B, 1, 1, C)

        def transform(name):
            t = nn.Conv(planes, (1, 1), dtype=self.dtype,
                        name=f"{name}_conv1")(context)
            t = nn.LayerNorm(dtype=self.dtype, name=f"{name}_ln")(t)
            t = nn.relu(t)
            return nn.Conv(c, (1, 1), dtype=self.dtype,
                           kernel_init=nn.initializers.zeros,
                           name=f"{name}_conv2")(t)

        out = x
        if "channel_mul" in self.fusion_types:
            out = out * jax.nn.sigmoid(transform("channel_mul"))
        if "channel_add" in self.fusion_types:
            out = out + transform("channel_add")
        return out


def corner_pool(x, direction):
    """CornerNet corner pooling (reference ``mmcv.ops.CornerPool`` —
    CUDA scan kernels): a directional running max, i.e. a cummax along
    one spatial axis — native XLA ``associative_scan``.

    x: ``(B, H, W, C)``; direction: top/bottom/left/right.
    top: out[i] = max(x[i:]) along H; bottom: max(x[:i+1]); left/right
    analogous along W.
    """
    axis = 1 if direction in ("top", "bottom") else 2
    reverse = direction in ("top", "left")
    return jax.lax.associative_scan(jnp.maximum, x, axis=axis,
                                    reverse=reverse)


def masked_conv2d(x, mask, kernel, bias=None, padding=1):
    """MaskedConv2d (reference ``mmcv.ops.MaskedConv2d``, guided
    anchoring): compute the conv only where ``mask`` is set — on TPU the
    dense conv is cheaper than any sparse bookkeeping, so this is
    ``conv(x) * mask`` with masked bias, numerically identical.

    mask: ``(B, H, W)`` or ``(B, H, W, 1)``.
    """
    if mask.ndim == 3:
        mask = mask[..., None]
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias
    return out * mask.astype(out.dtype)
