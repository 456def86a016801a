"""NAS-FCOS head (arXiv 1906.04423).

reference: ``mmdet/models/dense_heads/nasfcos_head.py`` — FCOS head
whose towers use the searched op sequence
[DCNv2 3x3 (deform_groups=2), conv 3x3, DCNv2 3x3, conv 1x1], each with
GN + ReLU; decode identical to FCOS.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...ops.deform_conv import ModulatedDeformConv2d


class _SearchedTower(nn.Module):
    feat_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        arch = [("dconv", 3), ("conv", 3), ("dconv", 3), ("conv", 1)]
        for i, (op, k) in enumerate(arch):
            if op == "dconv":
                x = ModulatedDeformConv2d(
                    features=self.feat_channels, kernel_size=k,
                    padding=k // 2, use_bias=True, dtype=self.dtype,
                    name=f"op{i}")(x)
            else:
                x = nn.Conv(self.feat_channels, (k, k),
                            padding=[(k // 2,) * 2] * 2, dtype=self.dtype,
                            name=f"op{i}")(x)
            x = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                             name=f"gn{i}")(x)
            x = nn.relu(x)
        return x


class NASFCOSHead(nn.Module):
    """Same output contract as :class:`FCOSHead` (cls, exp-reg, ctr)."""
    num_classes: int = 1
    in_channels: int = 256
    feat_channels: int = 256
    num_levels: int = 5
    centerness_on_reg: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        cls_tower = _SearchedTower(self.feat_channels, dtype=self.dtype,
                                   name="cls_tower")
        reg_tower = _SearchedTower(self.feat_channels, dtype=self.dtype,
                                   name="reg_tower")
        bias_init = nn.initializers.constant(
            float(-np.log((1 - 0.01) / 0.01)))
        conv_cls = nn.Conv(self.num_classes, (3, 3),
                           padding=[(1, 1), (1, 1)], dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=bias_init, name="conv_cls")
        conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name="conv_reg")
        conv_ctr = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name="conv_centerness")
        scales = [self.param(f"scale{i}", nn.initializers.ones, ())
                  for i in range(self.num_levels)]

        cls_out, reg_out, ctr_out = [], [], []
        for lvl, x in enumerate(feats):
            c = cls_tower(x)
            r = reg_tower(x)
            cls_out.append(conv_cls(c).astype(jnp.float32))
            ctr_feat = r if self.centerness_on_reg else c
            ctr_out.append(conv_ctr(ctr_feat).astype(jnp.float32))
            reg = conv_reg(r).astype(jnp.float32) * scales[lvl]
            reg_out.append(jnp.exp(reg))
        return cls_out, reg_out, ctr_out
