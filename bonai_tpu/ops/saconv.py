"""SAC — Switchable Atrous Convolution (DetectoRS, arXiv 2006.02334).

reference: mmcv ``ops/saconv.py`` (SAConv2d over ConvAWS2d) as consumed
by ``mmdet/models/backbones/detectors_resnet.py``.  Behaviour per the
paper (sec. 4): the SAME weight runs at two atrous rates (1 and 3, the
rate-3 branch adding a trainable ``weight_diff``), blended by a spatial
switch S(x) = sigmoid(1x1 conv on 5x5-avg-pooled input); SE-style global
context (zero-init 1x1 on GAP) wraps the op before and after; weights
are AWS-standardised (zero mean / unit std per output channel).

TPU notes: both atrous branches are dense MXU convs; the switch and the
context adds fuse into them — no dynamic control flow.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class SAConv2d(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (k, k, cin, self.features), jnp.float32)
        weight_diff = self.param("weight_diff", nn.initializers.zeros,
                                 w.shape, jnp.float32)
        # AWS: standardise over (kh, kw, cin) per output channel, then a
        # learnable per-channel affine (mmcv ConvAWS2d weight_gamma/
        # weight_beta).  mmcv recalibrates gamma/beta from pretrained
        # weight stats at load time; from scratch we init gamma at the
        # kaiming std so the op starts at conventional scale (gamma=1
        # would mean unit-std weights -> ~k^2*cin x activation variance,
        # which explodes without trainable BN).
        fan_out_std = float(np.sqrt(2.0 / (k * k * self.features)))
        gamma = self.param("weight_gamma",
                           nn.initializers.constant(fan_out_std),
                           (1, 1, 1, self.features), jnp.float32)
        beta = self.param("weight_beta", nn.initializers.zeros,
                          (1, 1, 1, self.features), jnp.float32)
        mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        std = jnp.std(w, axis=(0, 1, 2), keepdims=True) + 1e-5
        w_std = (w - mean) / std * gamma + beta

        # pre-context (zero-init: starts as identity)
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = x + nn.Conv(cin, (1, 1), dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        name="pre_context")(gap).astype(x.dtype)

        # switch on 5x5-avg-pooled input (bias 1 -> rate-1 branch
        # dominates at init, matching mmcv constant_init(switch, 0, 1))
        sw_in = nn.avg_pool(x, (5, 5), strides=(self.stride,) * 2,
                            padding=[(2, 2), (2, 2)])
        s = jax.nn.sigmoid(nn.Conv(
            1, (1, 1), dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.ones, name="switch")(sw_in))

        def branch(weight, rate):
            pad = rate * (k // 2)
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), weight.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)],
                rhs_dilation=(rate, rate),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        r1 = self.dilation
        out = s * branch(w_std, r1) + (1 - s) * branch(
            w_std + weight_diff, 3 * r1)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
            out = out + b.astype(out.dtype)

        # post-context
        gap2 = jnp.mean(out, axis=(1, 2), keepdims=True)
        out = out + nn.Conv(self.features, (1, 1), dtype=self.dtype,
                            kernel_init=nn.initializers.zeros,
                            name="post_context")(gap2).astype(out.dtype)
        return out
