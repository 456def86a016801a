"""HRNet backbone (flax, NHWC).

reference: ``mmdet/models/backbones/hrnet.py`` (537 LoC) — parallel
multi-resolution branches with repeated cross-resolution fusion; stem →
bottleneck stage1 → 3 multi-branch stages of BasicBlock HRModules.
Config surface matches the reference ``extra`` dict (num_modules,
num_branches, num_blocks, num_channels per stage).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import BasicBlock, Bottleneck, FrozenBatchNorm, conv


def _upsample_to(x, h, w):
    """Nearest upsample by integer factor (HR fuse layers)."""
    b, xh, xw, c = x.shape
    fy, fx = h // xh, w // xw
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (b, xh, fy, xw, fx, c))
    return x.reshape(b, h, w, c)


class HRModule(nn.Module):
    num_branches: int
    num_blocks: Sequence[int]
    channels: Sequence[int]
    multiscale_output: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs):
        # per-branch basic blocks
        outs = []
        for b in range(self.num_branches):
            x = xs[b]
            for i in range(self.num_blocks[b]):
                x = BasicBlock(planes=self.channels[b], stride=1,
                               downsample=(x.shape[-1] != self.channels[b]
                                           and i == 0),
                               dtype=self.dtype,
                               name=f"branch{b}_block{i}")(x)
            outs.append(x)
        # cross-resolution fuse
        n_out = self.num_branches if self.multiscale_output else 1
        fused = []
        for i in range(n_out):
            h, w = outs[i].shape[1], outs[i].shape[2]
            acc = outs[i]
            for j in range(self.num_branches):
                if j == i:
                    continue
                y = outs[j]
                if j > i:       # lower res -> 1x1 conv + upsample
                    y = conv(self.channels[i], 1, 1, 0,
                             f"fuse{i}_{j}_conv", self.dtype)(y)
                    y = FrozenBatchNorm(dtype=self.dtype,
                                        name=f"fuse{i}_{j}_bn")(y)
                    y = _upsample_to(y, h, w)
                else:           # higher res -> strided 3x3 conv chain
                    for k in range(i - j):
                        last = (k == i - j - 1)
                        ch = self.channels[i] if last else self.channels[j]
                        y = conv(ch, 3, 2, 1, f"fuse{i}_{j}_down{k}",
                                 self.dtype)(y)
                        y = FrozenBatchNorm(
                            dtype=self.dtype,
                            name=f"fuse{i}_{j}_down{k}_bn")(y)
                        if not last:
                            y = nn.relu(y)
                acc = acc + y
            fused.append(nn.relu(acc))
        return fused


class HRNet(nn.Module):
    """reference config surface: ``extra`` stage dicts (e.g. HRNet-W32)."""
    extra: Any = None
    frozen_stages: int = -1
    norm_eval: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        extra = self.extra or default_w32_extra()
        x = x.astype(self.dtype)
        # stem: two stride-2 3x3 convs
        for i in (1, 2):
            x = conv(64, 3, 2, 1, f"conv{i}", self.dtype)(x)
            x = FrozenBatchNorm(dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        # stage 1: bottleneck layer
        s1 = extra["stage1"]
        for i in range(s1["num_blocks"][0]):
            x = Bottleneck(planes=s1["num_channels"][0], stride=1,
                           downsample=(i == 0), dtype=self.dtype,
                           name=f"layer1_{i}")(x)
        if self.frozen_stages >= 1:
            x = jax.lax.stop_gradient(x)

        xs = [x]
        prev_channels = [x.shape[-1]]
        for stage_idx, key in enumerate(("stage2", "stage3", "stage4"), 2):
            cfg = extra[key]
            channels = list(cfg["num_channels"])
            # transition: adjust/create branches
            new_xs = []
            for b in range(cfg["num_branches"]):
                if b < len(xs):
                    y = xs[b]
                    if y.shape[-1] != channels[b]:
                        y = conv(channels[b], 3, 1, 1,
                                 f"t{stage_idx}_{b}", self.dtype)(y)
                        y = FrozenBatchNorm(dtype=self.dtype,
                                            name=f"t{stage_idx}_{b}_bn")(y)
                        y = nn.relu(y)
                else:           # new lower-resolution branch
                    y = conv(channels[b], 3, 2, 1,
                             f"t{stage_idx}_{b}", self.dtype)(xs[-1])
                    y = FrozenBatchNorm(dtype=self.dtype,
                                        name=f"t{stage_idx}_{b}_bn")(y)
                    y = nn.relu(y)
                new_xs.append(y)
            xs = new_xs
            for m in range(cfg["num_modules"]):
                xs = HRModule(num_branches=cfg["num_branches"],
                              num_blocks=cfg["num_blocks"],
                              channels=channels, dtype=self.dtype,
                              name=f"{key}_module{m}")(xs)
            if self.frozen_stages >= stage_idx:
                xs = [jax.lax.stop_gradient(v) for v in xs]
        return tuple(xs)


def default_w32_extra():
    return dict(
        stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                    num_blocks=(4,), num_channels=(64,)),
        stage2=dict(num_modules=1, num_branches=2, block="BASIC",
                    num_blocks=(4, 4), num_channels=(32, 64)),
        stage3=dict(num_modules=4, num_branches=3, block="BASIC",
                    num_blocks=(4, 4, 4), num_channels=(32, 64, 128)),
        stage4=dict(num_modules=3, num_branches=4, block="BASIC",
                    num_blocks=(4, 4, 4, 4),
                    num_channels=(32, 64, 128, 256)),
    )
