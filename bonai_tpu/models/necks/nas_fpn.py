"""NAS-FPN (arXiv 1904.07392).

reference: ``mmdet/models/necks/nas_fpn.py`` + mmcv
``ops/merge_cells.py`` (SumCell, GlobalPoolingCell) — the searched
9-cell merging stage over P3-P7, stacked ``stack_times``.

TPU notes: the cell graph is static python; resizes reuse the
nearest-up / max-pool-down rule; cell out-convs are pre-activated 3x3
convs (mmcv order ('act', 'conv', 'norm'), norm None here).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .nasfcos_fpn import _resize_to


class _MergeCell(nn.Module):
    """Binary cell: resize to out_size, merge, pre-act 3x3 out conv."""
    channels: int
    kind: str = "sum"                 # 'sum' | 'gp'
    with_out_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, out_size):
        th, tw = out_size
        x1 = _resize_to(x1, th, tw)
        x2 = _resize_to(x2, th, tw)
        if self.kind == "gp":
            # attention from x2's global pool gates x1 (mmcv
            # GlobalPoolingCell._binary_op)
            att = jax.nn.sigmoid(jnp.mean(x2, axis=(1, 2), keepdims=True))
            x = x2 + att * x1
        else:
            x = x1 + x2
        if self.with_out_conv:
            x = nn.relu(x)
            x = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name="out_conv")(x)
        return x


class NASFPN(nn.Module):
    """reference ``nas_fpn.py:9-160``."""
    in_channels: Sequence[int] = (512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 7
    start_level: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        c = self.out_channels
        feats = []
        for i in range(self.start_level, len(self.in_channels)):
            feats.append(nn.Conv(c, (1, 1), dtype=self.dtype,
                                 name=f"lateral{i}")(inputs[i]))
        n_extra = self.num_outs - len(feats)
        for i in range(n_extra):
            v = nn.Conv(c, (1, 1), dtype=self.dtype,
                        name=f"extra{i}")(feats[-1])
            feats.append(nn.max_pool(v, (2, 2), strides=(2, 2)))
        p3, p4, p5, p6, p7 = feats

        def size(p):
            return p.shape[1:3]

        for s in range(self.stack_times):
            def cell(name, kind="sum", with_out_conv=True):
                return _MergeCell(channels=c, kind=kind,
                                  with_out_conv=with_out_conv,
                                  dtype=self.dtype, name=f"s{s}_{name}")

            p4_1 = cell("gp_64_4", "gp")(p6, p4, size(p4))
            p4_2 = cell("sum_44_4")(p4_1, p4, size(p4))
            p3 = cell("sum_43_3")(p4_2, p3, size(p3))
            p4 = cell("sum_34_4")(p3, p4_2, size(p4))
            p5_tmp = cell("gp_43_5", "gp", False)(p4, p3, size(p5))
            p5 = cell("sum_55_5")(p5, p5_tmp, size(p5))
            p7_tmp = cell("gp_54_7", "gp", False)(p5, p4_2, size(p7))
            p7 = cell("sum_77_7")(p7, p7_tmp, size(p7))
            p6 = cell("gp_75_6", "gp")(p7, p5, size(p6))
        return [p3, p4, p5, p6, p7]
