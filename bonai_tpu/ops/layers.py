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
import numpy as np


def conv_ws_2d(x, kernel, bias=None, stride=1, padding=1, eps=1e-5,
               groups=1):
    """Weight-standardised conv (reference ``mmcv.cnn.conv_ws_2d`` /
    ``ConvWS2d``; arXiv 1903.10520): the kernel is z-scored over
    (kh, kw, cin) per output channel before the convolution.

    kernel: ``(kh, kw, cin/groups, cout)`` (flax layout).
    """
    mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
    std = jnp.std(kernel, axis=(0, 1, 2), keepdims=True)
    k = (kernel - mean) / (std + eps)
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        feature_group_count=groups,
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
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (self.kernel_size, self.kernel_size,
             x.shape[-1] // self.groups, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32) \
            if self.use_bias else None
        return conv_ws_2d(x.astype(self.dtype), k.astype(self.dtype),
                          None if b is None else b.astype(self.dtype),
                          self.stride, self.kernel_size // 2, self.eps,
                          self.groups)


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


class GeneralizedAttention(nn.Module):
    """Generalized attention block (reference ``mmcv.cnn.
    GeneralizedAttention`` used by the empirical-attention configs;
    arXiv 1904.05873).  ``attention_type`` toggles the four factorised
    terms: [0] query-key content, [1] query & relative-position,
    [2] key content only, [3] relative-position only.

    TPU note: the reference's ``spatial_range`` locality mask and the
    9x9 position approximation exist to bound the CUDA kernel's memory;
    the dense (HW x HW) attention here is a pair of MXU matmuls and
    needs no approximation at detection feature sizes.
    """
    num_heads: int = 9
    attention_type: str = "1111"
    kv_stride: int = 2
    q_stride: int = 1
    position_magnitude: int = 1
    position_embedding_dim: int = -1
    spatial_range: int = -1   # config parity; the dense TPU attention
                              # needs no locality bound (see TPU note)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads = self.num_heads
        at = [t == "1" for t in self.attention_type]
        # ::stride slice length (ceil division — h need not be divisible)
        qh = -(-h // self.q_stride)
        qw = -(-w // self.q_stride)
        kh = -(-h // self.kv_stride)
        kw = -(-w // self.kv_stride)
        pe_dim = self.position_embedding_dim \
            if self.position_embedding_dim > 0 else c
        init = nn.initializers.normal(0.01)

        xq = x[:, ::self.q_stride, ::self.q_stride]
        xk = x[:, ::self.kv_stride, ::self.kv_stride]
        # per-head embed dim (reference mmcv generalized_attention.py:
        # qk_embed_dim = in_channels // num_heads; the q/k/v convs emit
        # num_heads * qk_embed_dim channels, which is < c when c is not
        # divisible by num_heads)
        dk = c // heads
        qkv_ch = heads * dk

        def heads_split(t, hh, ww):
            return t.reshape(b, hh * ww, heads, dk).transpose(0, 2, 1, 3)

        energy = 0.0
        if at[0] or at[1]:
            q = nn.Conv(qkv_ch, (1, 1), use_bias=False, dtype=self.dtype,
                        kernel_init=init, name="query_conv")(xq)
            q = heads_split(q, qh, qw)                  # (B, Hd, Nq, dk)
        if at[0] or at[2]:
            k = nn.Conv(qkv_ch, (1, 1), use_bias=False, dtype=self.dtype,
                        kernel_init=init, name="key_conv")(xk)
            k = heads_split(k, kh, kw)                  # (B, Hd, Nk, dk)
        if at[1] or at[3]:
            # sinusoidal relative-position embedding -> projected keys
            ry = (jnp.arange(qh, dtype=jnp.float32)[:, None]
                  * self.q_stride
                  - jnp.arange(kh, dtype=jnp.float32)[None, :]
                  * self.kv_stride) / self.position_magnitude
            rx = (jnp.arange(qw, dtype=jnp.float32)[:, None]
                  * self.q_stride
                  - jnp.arange(kw, dtype=jnp.float32)[None, :]
                  * self.kv_stride) / self.position_magnitude

            def embed(rel):
                feat_dim = pe_dim // 2
                freq = jnp.arange(feat_dim // 2, dtype=jnp.float32)
                inv = 100.0 ** (2.0 * freq / feat_dim)
                ang = rel[..., None] / inv
                return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], -1)
            ey = nn.Dense(dk, use_bias=False, dtype=self.dtype,
                          kernel_init=init,
                          name="appr_geom_y")(embed(ry))  # (qh, kh, dk)
            ex = nn.Dense(dk, use_bias=False, dtype=self.dtype,
                          kernel_init=init,
                          name="appr_geom_x")(embed(rx))  # (qw, kw, dk)
        if at[1]:
            qg = nn.Conv(qkv_ch, (1, 1), use_bias=False,
                         dtype=self.dtype, kernel_init=init,
                         name="geom_query_conv")(xq)
            qg = heads_split(qg, qh, qw).reshape(b, heads, qh, qw, dk)
        if at[2]:
            kbias = self.param("key_content_bias", init, (heads, dk),
                               jnp.float32).astype(self.dtype)
        if at[3]:
            gbias = self.param("geom_bias", init, (heads, dk),
                               jnp.float32).astype(self.dtype)

        if at[0]:
            energy = energy + jnp.einsum("bhqd,bhkd->bhqk", q, k)
        if at[2]:
            energy = energy + jnp.einsum("hd,bhkd->bhk", kbias,
                                         k)[:, :, None, :]
        pos = 0.0
        if at[1]:
            pos = pos \
                + jnp.einsum("bhyxd,ykd->bhyxk", qg, ey)[..., :, None] \
                + jnp.einsum("bhyxd,xkd->bhyxk", qg, ex)[..., None, :]
        if at[3]:
            pos = pos \
                + jnp.einsum("hd,ykd->hyk", gbias,
                             ey)[None, :, :, None, :, None] \
                + jnp.einsum("hd,xkd->hxk", gbias,
                             ex)[None, :, None, :, None, :]
        if at[1] or at[3]:
            pos = jnp.broadcast_to(pos, (b, heads, qh, qw, kh, kw))
            if at[0] or at[2]:
                base = jnp.broadcast_to(
                    jnp.asarray(energy),
                    (b, heads, qh * qw, kh * kw)).reshape(
                    b, heads, qh, qw, kh, kw)
            else:
                base = 0.0
            energy = (base + pos).reshape(b, heads, qh * qw, kh * kw)
        else:
            # content-only modes may carry a broadcastable query dim
            energy = jnp.broadcast_to(jnp.asarray(energy),
                                      (b, heads, qh * qw, kh * kw))

        attn = jax.nn.softmax(
            jnp.asarray(energy).astype(jnp.float32) / np.sqrt(dk),
            axis=-1).astype(x.dtype)
        v = nn.Conv(qkv_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=init, name="value_conv")(xk)
        v = heads_split(v, kh, kw)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, qh, qw, qkv_ch)
        out = nn.Conv(c, (1, 1), dtype=self.dtype,
                      kernel_init=nn.initializers.zeros,
                      name="proj_conv")(out)
        if self.q_stride > 1:
            out = jax.image.resize(out, (b, h, w, c), method="bilinear")
        return x + out
