"""RFP — Recursive Feature Pyramid (DetectoRS, arXiv 2006.02334).

reference: ``mmdet/models/necks/rfp.py`` — FPN whose outputs are fed
back (via ASPP) into fresh backbone copies for ``rfp_steps - 1``
unrolled refinement steps, fused by a zero-init sigmoid gate.

TPU notes: the recursion is statically unrolled (rfp_steps is config);
each step's backbone is an independent parameterised module called
exactly once, so the whole pyramid is one XLA program.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.resnet import ResNet
from .fpn import FPN


class ASPP(nn.Module):
    """4-branch atrous pyramid (reference ``rfp.py:10-60``): three
    dilated 3x3/1x1 convs on x + one 1x1 on GAP, concatenated."""
    out_channels: int = 64
    dilations: Sequence[int] = (1, 3, 6, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        outs = []
        for i, d in enumerate(self.dilations):
            k = 3 if d > 1 else 1
            pad = d if d > 1 else 0
            inp = gap if i == len(self.dilations) - 1 else x
            v = nn.Conv(self.out_channels, (k, k),
                        padding=[(pad, pad), (pad, pad)],
                        kernel_dilation=(d, d), dtype=self.dtype,
                        name=f"aspp{i}")(inp)
            outs.append(nn.relu(v))
        outs[-1] = jnp.broadcast_to(
            outs[-1], outs[-2].shape[:3] + (self.out_channels,))
        return jnp.concatenate(outs, -1)


class RFP(nn.Module):
    """reference ``rfp.py:63-128``.  ``__call__`` takes the backbone's
    ``output_img=True`` tuple ``(img, c2, c3, c4, c5)``."""
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    rfp_steps: int = 2
    rfp_backbone: Any = None
    aspp_out_channels: int = 64
    aspp_dilations: Sequence[int] = (1, 3, 6, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        img = inputs[0]
        feats = list(inputs[1:])
        fpn = FPN(in_channels=tuple(self.in_channels),
                  out_channels=self.out_channels, num_outs=self.num_outs,
                  dtype=self.dtype, name="fpn")
        x = list(fpn(feats))
        aspp = ASPP(out_channels=self.aspp_out_channels,
                    dilations=tuple(self.aspp_dilations),
                    dtype=self.dtype, name="rfp_aspp")
        rb = dict(self.rfp_backbone or {})
        rb.pop("type", None)
        rb.pop("pretrained", None)
        rb.pop("rfp_inplanes", None)
        # one gate conv shared across levels and steps (reference:
        # self.rfp_weight, constant_init 0 -> each step starts as
        # identity over the previous pyramid)
        rfp_weight = nn.Conv(1, (1, 1),
                             kernel_init=nn.initializers.zeros,
                             dtype=self.dtype, name="rfp_weight")
        for step in range(1, self.rfp_steps):
            # backbone stages 1..3 receive ASPP'd P3..P5 (reference:
            # rfp_feats = [x[0]] + [aspp(x[i]) for i in 1..]; stage 0
            # gets None in rfp_forward)
            rfp_feats = [None] + [aspp(x[i]) for i in range(1, 4)]
            bk = ResNet(
                depth=rb.get("depth", 50),
                num_stages=rb.get("num_stages", 4),
                base_channels=rb.get("base_channels", 64),
                out_indices=tuple(rb.get("out_indices", (0, 1, 2, 3))),
                frozen_stages=rb.get("frozen_stages", -1),
                style=rb.get("style", "pytorch"),
                sac=rb.get("sac"),
                stage_with_sac=tuple(rb.get("stage_with_sac",
                                            (False,) * 4)),
                dtype=self.dtype, name=f"rfp_backbone{step}")
            feats_i = bk(img, rfp_feats=rfp_feats)
            x_i = list(fpn(list(feats_i)))
            x_new = []
            for ft, prev in zip(x_i, x):
                w = jax.nn.sigmoid(rfp_weight(ft))
                x_new.append(w * ft + (1 - w) * prev)
            x = x_new
        return x
