"""HourglassNet backbone (CornerNet family).

reference: ``mmdet/models/backbones/hourglass.py:9-195`` — recursive
HourglassModule over BasicBlock ResLayers with stacked intermediate
supervision.

TPU notes: the recursion depth is static (config), so the whole net
unrolls into one traced graph; upsampling is nearest 2x (reference
``nn.Upsample`` default).  BN follows the repo-wide FrozenBatchNorm
convention (running stats fixed, affine trainable) — the reference
trains BN statistics; scratch-training here behaves as affine-only
normalisation.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import BasicBlock, FrozenBatchNorm, conv


def _res_layer(x, planes, blocks, stride=1, downsample_first=True,
               dtype=jnp.float32, name=""):
    """Stack of BasicBlocks (reference ``mmdet/models/utils/res_layer.py``).

    ``downsample_first=False`` puts the channel-change block last
    (reference ResLayer arg used by hourglass ``low3``).
    """
    def blk(i, v, ds, st):
        return BasicBlock(planes=planes, stride=st, downsample=ds,
                          dtype=dtype, name=f"{name}_b{i}")(v)
    for i in range(blocks):
        if downsample_first:
            ds = i == 0 and (stride != 1 or x.shape[-1] != planes)
            x = blk(i, x, ds, stride if i == 0 else 1)
        else:
            last = i == blocks - 1
            ds = last and x.shape[-1] != planes
            x = blk(i, x, ds, 1) if last else BasicBlock(
                planes=x.shape[-1], stride=1, downsample=False, dtype=dtype,
                name=f"{name}_b{i}")(x)
    return x


class HourglassModule(nn.Module):
    """One recursive hourglass (reference ``hourglass.py:9-77``)."""
    depth: int
    stage_channels: Sequence[int]
    stage_blocks: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cur_c, next_c = self.stage_channels[0], self.stage_channels[1]
        cur_b, next_b = self.stage_blocks[0], self.stage_blocks[1]
        up1 = _res_layer(x, cur_c, cur_b, dtype=self.dtype, name="up1")
        low1 = _res_layer(x, next_c, cur_b, stride=2, dtype=self.dtype,
                          name="low1")
        if self.depth > 1:
            low2 = HourglassModule(self.depth - 1, self.stage_channels[1:],
                                   self.stage_blocks[1:], dtype=self.dtype,
                                   name="low2")(low1)
        else:
            low2 = _res_layer(low1, next_c, next_b, dtype=self.dtype,
                              name="low2")
        low3 = _res_layer(low2, cur_c, cur_b, downsample_first=False,
                          dtype=self.dtype, name="low3")
        up2 = jax.image.resize(
            low3, (low3.shape[0], low3.shape[1] * 2, low3.shape[2] * 2,
                   low3.shape[3]), "nearest")
        return up1 + up2


def _conv_bn_relu(x, c, k, stride, pad, dtype, name, relu=True):
    x = conv(c, k, stride, pad, f"{name}_conv", dtype)(x)
    x = FrozenBatchNorm(dtype=dtype, name=f"{name}_bn")(x)
    return nn.relu(x) if relu else x


class HourglassNet(nn.Module):
    """Stacked hourglass (reference ``hourglass.py:81-195``).  Returns
    one feature per stack at stride 4 (e.g. 2 maps for Hourglass-104)."""
    downsample_times: int = 5
    num_stacks: int = 2
    stage_channels: Sequence[int] = (256, 256, 384, 384, 384, 512)
    stage_blocks: Sequence[int] = (2, 2, 2, 2, 2, 4)
    feat_channel: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cur_c = self.stage_channels[0]
        x = _conv_bn_relu(x, 128, 7, 2, 3, self.dtype, "stem0")
        x = _res_layer(x, cur_c, 1, stride=2, dtype=self.dtype, name="stem1")

        outs = []
        for i in range(self.num_stacks):
            hg = HourglassModule(self.downsample_times, self.stage_channels,
                                 self.stage_blocks, dtype=self.dtype,
                                 name=f"hg{i}")(x)
            out = _conv_bn_relu(hg, self.feat_channel, 3, 1, 1, self.dtype,
                                f"out{i}")
            outs.append(out)
            if i < self.num_stacks - 1:
                a = _conv_bn_relu(x, cur_c, 1, 1, 0, self.dtype,
                                  f"inter1x1_{i}", relu=False)
                b = _conv_bn_relu(out, cur_c, 1, 1, 0, self.dtype,
                                  f"remap{i}", relu=False)
                x = _res_layer(nn.relu(a + b), cur_c, 1, dtype=self.dtype,
                               name=f"inter{i}")
        return outs
