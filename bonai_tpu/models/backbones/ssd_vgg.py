"""SSD-VGG backbone.

reference: ``mmdet/models/backbones/ssd_vgg.py`` (VGG16 trunk with
dilated fc6/fc7 convs, L2Norm on the conv4_3 output, and a ladder of
stride-2 "extra" convs producing the coarse detection levels).

TPU notes: this is a plain feed-forward conv stack — XLA fuses the
conv+relu chain onto the MXU; ceil-mode max-pool becomes an explicit
asymmetric pad + valid-window reduce (flax pools have no ceil mode).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# conv counts per VGG stage keyed by depth (reference mmcv.cnn.VGG)
_VGG_STAGES = {11: (1, 1, 2, 2, 2), 13: (2, 2, 2, 2, 2),
               16: (2, 2, 3, 3, 3), 19: (2, 2, 4, 4, 4)}
_STAGE_CH = (64, 128, 256, 512, 512)

# extra-conv ladders; 'S' marks a stride-2 3x3 conv (reference
# ``ssd_vgg.py:33-36``)
_EXTRA = {300: (256, "S", 512, 128, "S", 256, 128, 256, 128, 256),
          512: (256, "S", 512, 128, "S", 256, 128, "S", 256, 128, "S",
                256, 128)}


def _ceil_maxpool(x, k=2, s=2):
    """Max pool with ceil_mode=True: pad bottom/right with -inf so the
    last partial window is kept."""
    h, w = x.shape[1], x.shape[2]
    ph = (-(h - k) % s) if h > k else 0
    pw = (-(w - k) % s) if w > k else 0
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (k, k), strides=(s, s))


class SSDVGG(nn.Module):
    """VGG16 + extras.  Returns 6 levels for 300 input, 7 for 512.

    Output channels: (512, 1024, 512, 256, 256, 256[, 256])."""
    input_size: int = 300
    depth: int = 16
    l2_norm_scale: float = 20.0
    out_feature_indices: Tuple[int, ...] = (22, 34)
    out_indices: Sequence[int] = (3, 4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        xavier = nn.initializers.xavier_uniform()
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        stages = _VGG_STAGES[self.depth]
        outs = []
        # VGG trunk; conv4_3 (last conv of stage 4) is the first output
        for si, (n, ch) in enumerate(zip(stages, _STAGE_CH)):
            for ci in range(n):
                x = nn.relu(nn.Conv(
                    ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    kernel_init=kaiming, name=f"conv{si + 1}_{ci + 1}")(x))
            if si == 3:
                outs.append(x)                       # conv4_3, pre-pool
            if si < 4:
                # pool3 uses ceil mode (75 -> 38 at 300 input)
                x = _ceil_maxpool(x)
            else:
                # pool5: 3x3 stride-1 pad-1 (keeps resolution)
                x = nn.max_pool(jnp.pad(
                    x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf), (3, 3), strides=(1, 1))
        # fc6 (3x3 dilation-6) + fc7 (1x1), both 1024ch
        x = nn.relu(nn.Conv(1024, (3, 3), padding=[(6, 6), (6, 6)],
                            kernel_dilation=(6, 6), dtype=self.dtype,
                            kernel_init=kaiming, name="fc6")(x))
        x = nn.relu(nn.Conv(1024, (1, 1), dtype=self.dtype,
                            kernel_init=kaiming, name="fc7")(x))
        outs.append(x)

        # extras: alternating 1x1 / 3x3; 'S' = stride-2 pad-1 on the 3x3
        plan = _EXTRA[self.input_size]
        k_alt, li = (1, 3), 0
        i = 0
        while i < len(plan):
            if plan[i] == "S":
                i += 1
                continue
            k = k_alt[li % 2]
            stride, padding = 1, 0
            if i >= 1 and plan[i - 1] == "S":
                stride, padding = 2, 1
            x = nn.relu(nn.Conv(
                int(plan[i]), (k, k), strides=(stride, stride),
                padding=[(padding, padding)] * 2, dtype=self.dtype,
                kernel_init=xavier, name=f"extra{li}")(x))
            if li % 2 == 1:
                outs.append(x)
            li += 1
            i += 1
        if self.input_size == 512:
            x = nn.relu(nn.Conv(256, (4, 4), padding=[(1, 1), (1, 1)],
                                dtype=self.dtype, kernel_init=xavier,
                                name=f"extra{li}")(x))
            outs.append(x)

        # L2Norm on conv4_3: per-pixel channel normalisation with a
        # learned per-channel scale (reference ``ssd_vgg.py:142-166``)
        scale = self.param("l2_norm_scale_p",
                           nn.initializers.constant(self.l2_norm_scale),
                           (outs[0].shape[-1],), jnp.float32)
        f = outs[0].astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(f * f, -1, keepdims=True) + 1e-10)
        outs[0] = (f / norm * scale).astype(outs[0].dtype)
        return tuple(outs)
