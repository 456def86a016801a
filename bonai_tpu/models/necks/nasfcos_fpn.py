"""NAS-FCOS FPN (arXiv 1906.04423).

reference: ``mmdet/models/necks/nasfcos_fpn.py`` + mmcv
``ops/merge_cells.py`` (ConcatCell) — the searched 7-cell merge DAG over
adapted C3/C4/C5, globally fused with f5, plus stride-2 extra levels.

TPU notes: the DAG is static python; resizes are nearest (up) /
max-pool (down) exactly as mmcv BaseMergeCell._resize; the grouped 1x1
out-conv (groups == channels, 2 -> 1 per group) is a feature_group conv.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _resize_to(x, th, tw):
    h, w = x.shape[1:3]
    if (h, w) == (th, tw):
        return x
    if h < th:                                 # upsample nearest
        return jax.image.resize(
            x, (x.shape[0], th, tw, x.shape[3]), "nearest")
    kh, kw = h // th, w // tw                  # downsample max-pool
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, kh, kw, 1), (1, kh, kw, 1), "VALID")


class ConcatCell(nn.Module):
    """Binary merge cell: per-input 3x3 conv (optional), resize to the
    larger input, channel-concat, pre-activated grouped 1x1 out conv
    (mmcv ``ConcatCell`` with out_conv_order ('norm', 'act', 'conv'))."""
    channels: int
    with_input1_conv: bool = True
    with_input2_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):
        def input_conv(v, name):
            v = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name=name)(v)
            return nn.relu(v)

        if self.with_input1_conv:
            x1 = input_conv(x1, "in1_conv")
        if self.with_input2_conv:
            x2 = input_conv(x2, "in2_conv")
        th = max(x1.shape[1], x2.shape[1])
        tw = max(x1.shape[2], x2.shape[2])
        x = jnp.concatenate([_resize_to(x1, th, tw),
                             _resize_to(x2, th, tw)], -1)
        # out_conv_order ('norm', 'act', 'conv'); BN -> per-channel GN(1)
        x = nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype,
                         name="out_norm")(x)
        x = nn.relu(x)
        return nn.Conv(self.channels, (1, 1), use_bias=False,
                       feature_group_count=self.channels,
                       dtype=self.dtype, name="out_conv")(x)


class NASFCOS_FPN(nn.Module):
    """reference ``nasfcos_fpn.py:14-149``."""
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        c = self.out_channels
        feats = []
        for i in range(self.start_level, len(self.in_channels)):
            v = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"adapt{i}")(inputs[i])
            v = nn.GroupNorm(num_groups=None, group_size=1,
                             dtype=self.dtype, name=f"adapt_bn{i}")(v)
            feats.append(nn.relu(v))

        # searched DAG (reference cell names c<idx1><idx2>)
        spec = [("c22_1", 2, 2, True, True), ("c22_2", 2, 2, True, True),
                ("c32", 3, 2, True, False), ("c02", 0, 2, True, False),
                ("c42", 4, 2, True, True), ("c36", 3, 6, True, True),
                ("c61", 6, 1, True, True)]
        for name, i1, i2, w1, w2 in spec:
            feats.append(ConcatCell(
                channels=c, with_input1_conv=w1, with_input2_conv=w2,
                dtype=self.dtype, name=name)(feats[i1], feats[i2]))

        ret = []
        for idx, input_idx in zip([9, 8, 7], [1, 2, 3]):   # P3, P4, P5
            f1, f2 = feats[idx], feats[5]
            th, tw = f1.shape[1:3]
            fsum = f1 + jax.image.resize(
                f2, (f2.shape[0], th, tw, f2.shape[3]), "bilinear")
            oh, ow = inputs[input_idx].shape[1:3]
            ret.append(jax.image.resize(
                fsum, (fsum.shape[0], oh, ow, fsum.shape[3]), "bilinear"))

        for i in range(self.num_outs - 3):                 # P6, P7
            v = ret[-1]
            if i > 0:
                v = nn.relu(v)
            v = nn.GroupNorm(num_groups=None, group_size=1,
                             dtype=self.dtype, name=f"extra_bn{i}")(v)
            ret.append(nn.Conv(c, (3, 3), strides=(2, 2),
                               padding=[(1, 1), (1, 1)], dtype=self.dtype,
                               name=f"extra{i}")(v))
        return ret
