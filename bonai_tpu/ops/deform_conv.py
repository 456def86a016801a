"""Deformable convolution v1/v2 (DCN) — XLA gather formulation.

reference: ``mmcv.ops.DeformConv2d`` / ``ModulatedDeformConv2d`` (CUDA)
as used by the reference's ``configs/dcn`` family and
``mmdet/models/backbones/resnet.py`` (``dcn=dict(...)`` stage plugins).

TPU-first design: the CUDA kernel's per-output-pixel sampling loop
becomes (1) one batched bilinear gather of all K*K deformed sample
positions — the same 4-corner row-gather machinery as RoIAlign — and
(2) one big matmul ``(B*H*W, K*K*Cin) @ (K*K*Cin, Cout)`` that runs on
the MXU.  Offsets follow the mmcv channel convention
``(y0, x0, y1, x1, ...)`` over kernel points in row-major order;
modulation (v2) multiplies each sampled value by its sigmoid mask.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def deform_conv2d(x, offset, kernel, bias=None, stride=1, padding=1,
                  dilation=1, mask=None, deform_groups=1):
    """Deformable conv (v1; v2 when ``mask`` is given).

    Args:
      x: ``(B, H, W, Cin)``.
      offset: ``(B, Ho, Wo, G*2*K*K)`` — per output position, per kernel
        point ``(dy, dx)`` pairs (mmcv ordering), per deform group.
      kernel: ``(kh, kw, Cin, Cout)``.
      mask: optional ``(B, Ho, Wo, G*K*K)`` modulation logits (v2 applies
        ``sigmoid``).
      deform_groups: input channels are split into G groups, each sampled
        with its own offset set (reference ``mdconv ... group4`` configs).
    Returns ``(B, Ho, Wo, Cout)``.
    """
    if deform_groups > 1:
        b, h, w, cin = x.shape
        kk2 = offset.shape[-1] // deform_groups
        kkm = (0 if mask is None else mask.shape[-1] // deform_groups)
        cg = cin // deform_groups
        outs = []
        for g in range(deform_groups):
            outs.append(_deform_sample(
                x[..., g * cg:(g + 1) * cg],
                offset[..., g * kk2:(g + 1) * kk2],
                None if mask is None
                else mask[..., g * kkm:(g + 1) * kkm],
                kernel.shape[0], kernel.shape[1], stride, padding,
                dilation))
        vals = jnp.concatenate(outs, axis=-1)       # (B,Ho,Wo,KK,Cin)
        return _deform_contract(vals, kernel, bias, x.dtype)
    kh, kw, _, cout = kernel.shape
    vals = _deform_sample(x, offset, mask, kh, kw, stride, padding,
                          dilation)
    return _deform_contract(vals, kernel, bias, x.dtype)


def _deform_sample(x, offset, mask, kh, kw, stride, padding, dilation):
    """Offset-guided bilinear sampling -> ``(B, Ho, Wo, KK, C)``."""
    b, h, w, cin = x.shape
    kk = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    # base sampling grid: output position * stride - pad + dilation*k
    oy = jnp.arange(ho, dtype=jnp.float32) * stride - padding
    ox = jnp.arange(wo, dtype=jnp.float32) * stride - padding
    ky, kx = np.meshgrid(np.arange(kh), np.arange(kw), indexing="ij")
    ky = jnp.asarray(ky.ravel() * dilation, jnp.float32)   # (KK,)
    kx = jnp.asarray(kx.ravel() * dilation, jnp.float32)

    off = offset.reshape(b, ho, wo, kk, 2)
    ys = oy[None, :, None, None] + ky[None, None, None, :] \
        + off[..., 0]                                       # (B,Ho,Wo,KK)
    xs = ox[None, None, :, None] + kx[None, None, None, :] \
        + off[..., 1]

    # bilinear sample with zeros outside (mmcv border behaviour)
    valid = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    yc = jnp.clip(ys, 0.0, h - 1.0)
    xc = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.clip(jnp.floor(yc), 0, max(h - 2, 0)).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xc), 0, max(w - 2, 0)).astype(jnp.int32)
    ly = yc - y0
    lx = xc - x0
    w00 = (1 - ly) * (1 - lx)
    w01 = (1 - ly) * lx
    w10 = ly * (1 - lx)
    w11 = ly * lx

    flat = x.reshape(b * h * w, cin)
    base = (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None, None, None]
    i00 = base + y0 * w + x0
    # mode="clip": the +1/+w corner rows run past the array on 1-wide /
    # 1-tall maps; their bilinear weight is exactly 0 there, but the
    # default fill mode would turn them into NaN * 0 = NaN
    gather = lambda i: jnp.take(flat, i, axis=0, mode="clip")
    vals = (gather(i00) * w00[..., None]
            + gather(i00 + 1) * w01[..., None]
            + gather(i00 + w) * w10[..., None]
            + gather(i00 + w + 1) * w11[..., None])
    vals = vals * valid[..., None].astype(vals.dtype)       # (B,Ho,Wo,KK,C)
    if mask is not None:
        vals = vals * jax.nn.sigmoid(
            mask.reshape(b, ho, wo, kk, 1).astype(vals.dtype))
    return vals


def _deform_contract(vals, kernel, bias, out_dtype):
    """(B, Ho, Wo, KK, Cin) x (kh, kw, Cin, Cout) MXU contraction."""
    b, ho, wo, kk, cin = vals.shape
    cout = kernel.shape[-1]
    out = jax.lax.dot_general(
        vals.reshape(b * ho * wo, kk * cin),
        kernel.reshape(kk * cin, cout),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_dtype)
    out = out.reshape(b, ho, wo, cout)
    if bias is not None:
        out = out + bias
    return out


class DeformConv2d(nn.Module):
    """DCNv1 module: a plain conv predicts nothing here — offsets are an
    input, matching ``mmcv.ops.DeformConv2d`` (the offset conv lives in
    the caller, e.g. the backbone plugin)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, offset):
        k = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (self.kernel_size, self.kernel_size, x.shape[-1],
             self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32) \
            if self.use_bias else None
        return deform_conv2d(
            x.astype(self.dtype), offset.astype(jnp.float32),
            k.astype(self.dtype),
            None if b is None else b.astype(self.dtype),
            self.stride, self.padding, self.dilation)


class ModulatedDeformConv2d(nn.Module):
    """DCNv2 with the conventional built-in offset+mask conv
    (``mmcv.ops.ModulatedDeformConv2dPack``): a zero-initialised plain
    conv predicts (offsets, mask logits) so the layer starts as a
    regular convolution.  ``deform_groups`` gives each channel group its
    own offset set (reference ``mdconv ... group4`` configs)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    use_bias: bool = False
    deform_groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kk = self.kernel_size * self.kernel_size
        g = self.deform_groups
        pred = nn.Conv(3 * kk * g, (self.kernel_size, self.kernel_size),
                       strides=(self.stride, self.stride),
                       padding=[(self.padding, self.padding)] * 2,
                       kernel_dilation=(self.dilation, self.dilation),
                       dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       name="conv_offset")(x)
        offset, mask = pred[..., :2 * kk * g], pred[..., 2 * kk * g:]
        k = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (self.kernel_size, self.kernel_size, x.shape[-1],
             self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32) \
            if self.use_bias else None
        return deform_conv2d(
            x.astype(self.dtype), offset.astype(jnp.float32),
            k.astype(self.dtype),
            None if b is None else b.astype(self.dtype),
            self.stride, self.padding, self.dilation,
            mask=mask.astype(jnp.float32), deform_groups=g)


class DeformConv2dPack(nn.Module):
    """DCNv1 with built-in offset conv (``mmcv.ops.DeformConv2dPack``):
    like the modulated pack but with no mask branch (reference
    ``dconv_c3-c5`` configs, dcn type='DCN')."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    use_bias: bool = False
    deform_groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kk = self.kernel_size * self.kernel_size
        g = self.deform_groups
        offset = nn.Conv(2 * kk * g, (self.kernel_size, self.kernel_size),
                         strides=(self.stride, self.stride),
                         padding=[(self.padding, self.padding)] * 2,
                         kernel_dilation=(self.dilation, self.dilation),
                         dtype=self.dtype,
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros,
                         name="conv_offset")(x)
        k = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (self.kernel_size, self.kernel_size, x.shape[-1],
             self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32) \
            if self.use_bias else None
        return deform_conv2d(
            x.astype(self.dtype), offset.astype(jnp.float32),
            k.astype(self.dtype),
            None if b is None else b.astype(self.dtype),
            self.stride, self.padding, self.dilation,
            deform_groups=g)
