"""Feature Pyramid Network neck.

reference: ``mmdet/models/necks/fpn.py:10-216`` — lateral 1x1 convs,
top-down nearest-neighbour upsample, 3x3 output convs, and (BONAI config:
``num_outs=5`` with 4 inputs, ``add_extra_convs=False``) one extra level
from stride-2 max-pooling of the last output.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


def _upsample_nearest_2x(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def conv_module(x, features, kernel, name, dtype, stride=1,
                norm_cfg=None, conv_cfg=None):
    """mmcv ``ConvModule`` semantics as used by FPN (act_cfg=None):
    conv (bias='auto' -> no bias when a norm follows) + optional norm.
    Thread point for the gn / gn+ws config families
    (reference ``mmdet/models/necks/fpn.py:10-216`` ``norm_cfg``/
    ``conv_cfg`` arguments)."""
    pad = kernel // 2
    ctype = (conv_cfg or {}).get("type", "Conv")
    if ctype == "ConvWS":
        from ...ops.layers import ConvWS2d
        x = ConvWS2d(features=features, kernel_size=kernel, stride=stride,
                     use_bias=norm_cfg is None, dtype=dtype, name=name)(x)
    else:
        x = nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                    padding=[(pad, pad), (pad, pad)],
                    use_bias=norm_cfg is None, dtype=dtype,
                    kernel_init=nn.initializers.xavier_uniform(),
                    name=name)(x)
    if norm_cfg is not None:
        from ..backbones.resnet import make_norm
        x = make_norm(norm_cfg, dtype, f"{name}_norm")(x)
    return x


class FPN(nn.Module):
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: Any = False
    # source of the first extra conv when add_extra_convs: 'input'
    # (retina-style, reference extra_convs_on_inputs=True / 'on_input'),
    # 'output' (fcos-style 'on_output'), or 'lateral'
    extra_convs_on: str = "input"
    relu_before_extra_convs: bool = False
    # nas_fpn crop640 configs: norm everywhere except the 1x1 laterals
    no_norm_on_lateral: bool = False
    norm_cfg: Any = None
    conv_cfg: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == len(self.in_channels)
        used = len(self.in_channels) - self.start_level

        def cm(x, features, kernel, name, stride=1, no_norm=False):
            return conv_module(x, features, kernel, name, self.dtype,
                               stride=stride,
                               norm_cfg=(None if no_norm
                                         else self.norm_cfg),
                               conv_cfg=self.conv_cfg)

        laterals = [
            cm(inputs[self.start_level + i], self.out_channels, 1,
               f"lateral_{i}", no_norm=self.no_norm_on_lateral)
            for i in range(used)
        ]
        for i in range(used - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest_2x(laterals[i])
        outs = [
            cm(laterals[i], self.out_channels, 3, f"fpn_{i}")
            for i in range(used)
        ]
        if self.num_outs > used:
            if not self.add_extra_convs:
                for _ in range(self.num_outs - used):
                    # torch F.max_pool2d(x, 1, stride=2)
                    outs.append(outs[-1][:, ::2, ::2, :])
            else:
                if self.extra_convs_on == "output":
                    extra_src = outs[-1]
                elif self.extra_convs_on == "lateral":
                    extra_src = laterals[-1]
                else:
                    extra_src = inputs[-1]
                for i in range(self.num_outs - used):
                    src = extra_src if i == 0 else outs[-1]
                    if i > 0 and self.relu_before_extra_convs:
                        src = nn.relu(src)
                    outs.append(cm(src, self.out_channels, 3, f"extra_{i}",
                                   stride=2))
        return tuple(outs)


class PAFPN(nn.Module):
    """Path Aggregation FPN (reference ``mmdet/models/necks/pafpn.py``;
    arXiv 1803.01534): FPN plus a bottom-up path — stride-2 downsample
    convs feed each level into the next-coarser one, followed by 3x3
    pafpn output convs."""
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    add_extra_convs: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == len(self.in_channels)
        used = len(self.in_channels) - self.start_level
        xavier = nn.initializers.xavier_uniform()

        laterals = [
            nn.Conv(self.out_channels, (1, 1), use_bias=True,
                    dtype=self.dtype, kernel_init=xavier,
                    name=f"lateral_{i}")(inputs[self.start_level + i])
            for i in range(used)
        ]
        for i in range(used - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] \
                + _upsample_nearest_2x(laterals[i])
        inter = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=True, dtype=self.dtype, kernel_init=xavier,
                    name=f"fpn_{i}")(laterals[i])
            for i in range(used)
        ]
        # bottom-up aggregation
        for i in range(used - 1):
            inter[i + 1] = inter[i + 1] + nn.Conv(
                self.out_channels, (3, 3), strides=(2, 2),
                padding=[(1, 1), (1, 1)], use_bias=True, dtype=self.dtype,
                kernel_init=xavier, name=f"downsample_{i}")(inter[i])
        outs = [inter[0]] + [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=True, dtype=self.dtype, kernel_init=xavier,
                    name=f"pafpn_{i - 1}")(inter[i])
            for i in range(1, used)
        ]
        if self.num_outs > used:
            if not self.add_extra_convs:
                for _ in range(self.num_outs - used):
                    outs.append(outs[-1][:, ::2, ::2, :])
            else:
                extra_src = inputs[-1]
                for i in range(self.num_outs - used):
                    src = extra_src if i == 0 else outs[-1]
                    outs.append(
                        nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                                padding=[(1, 1), (1, 1)], use_bias=True,
                                dtype=self.dtype, kernel_init=xavier,
                                name=f"extra_{i}")(src))
        return tuple(outs)
