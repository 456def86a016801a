"""LOFT offset heads: plain OffsetHead and the FOA OffsetHeadExpandFeature.

reference: ``mmdet/models/roi_heads/attribute_heads/offset_head.py:23-265``
and ``offset_head_expand_feature.py:25-461``.

TPU-first notes:
- The reference rotates the 7x7 RoI feature map with
  ``affine_grid``/``grid_sample`` per branch
  (``offset_head_expand_feature.py:163-196``).  For the shipped k*90°
  rotations this sampling is *exactly* ``rot90`` (verified numerically
  against torch grid_sample), so we use transpose/flip — free data
  movement on TPU, no gather kernel at all.
- GT target expansion (``expand_gt_offset`` + the x/y swap for 90/270,
  ``:271-344``) is a branch-indexed vectorised encode instead of a
  per-RoI ``.cpu().numpy()`` python loop.
- Inference fusion (``offset_fusion`` max-model ``:346-413``) keeps the
  max |value| per axis across branches with the 0°-branch polarity.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...core.boxes import offset2delta, offset_rotate


def rotate_feature(x, angle_deg):
    """Rotate NHWC features by k*90° counterclockwise (reference
    ``expand_feature``; equals torch grid_sample with the reference theta)."""
    k = (int(angle_deg) // 90) % 4
    return jnp.rot90(x, k=k, axes=(1, 2)) if k else x


def _branch_swaps_xy(angle_deg):
    return int(angle_deg) % 180 == 90


class OffsetHead(nn.Module):
    """4x conv3x3 + 2 FC + FC->2 (reference ``offset_head.py:23-105``)."""
    roi_feat_size: int = 7
    in_channels: int = 256
    num_convs: int = 4
    num_fcs: int = 2
    reg_num: int = 2
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        fc_init = nn.initializers.variance_scaling(
            1.0, "fan_in", "uniform")   # kaiming_uniform a=1 fan_in
        for i in range(self.num_convs):
            x = nn.Conv(self.conv_out_channels, (3, 3),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        kernel_init=kaiming, name=f"conv{i}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                                 kernel_init=fc_init, name=f"fc{i}")(x))
        out = nn.Dense(self.reg_num, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01),
                       name="fc_offset")(x)
        return out.astype(jnp.float32)


class OffsetHeadExpandFeature(nn.Module):
    """FOA: N rotation branches with per-branch convs and (optionally)
    shared FCs (reference ``offset_head_expand_feature.py:25-161``)."""
    roi_feat_size: int = 7
    in_channels: int = 256
    num_convs: int = 4
    num_fcs: int = 2
    reg_num: int = 2
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    expand_feature_num: int = 4
    share_expand_fc: bool = False
    rotations: Sequence[int] = (0, 90, 180, 270)
    offset_coordinate: str = "rectangle"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (N, S, S, C) RoI features -> (E, N, reg_num) predictions."""
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        fc_init = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")
        e = self.expand_feature_num
        outs = []
        shared_fcs = None
        if self.share_expand_fc:
            shared_fcs = [nn.Dense(self.fc_out_channels, dtype=self.dtype,
                                   kernel_init=fc_init, name=f"fc{i}")
                          for i in range(self.num_fcs)]
            shared_out = nn.Dense(self.reg_num, dtype=self.dtype,
                                  kernel_init=nn.initializers.normal(0.01),
                                  name="fc_offset")
        for idx in range(e):
            t = rotate_feature(x, self.rotations[idx])
            for i in range(self.num_convs):
                t = nn.Conv(self.conv_out_channels, (3, 3),
                            padding=[(1, 1), (1, 1)], dtype=self.dtype,
                            kernel_init=kaiming,
                            name=f"branch{idx}_conv{i}")(t)
                t = nn.relu(t)
            t = t.reshape(t.shape[0], -1)
            if self.share_expand_fc:
                for fc in shared_fcs:
                    t = nn.relu(fc(t))
                out = shared_out(t)
            else:
                for i in range(self.num_fcs):
                    t = nn.relu(nn.Dense(self.fc_out_channels,
                                         dtype=self.dtype,
                                         kernel_init=fc_init,
                                         name=f"branch{idx}_fc{i}")(t))
                out = nn.Dense(self.reg_num, dtype=self.dtype,
                               kernel_init=nn.initializers.normal(0.01),
                               name=f"branch{idx}_fc_offset")(t)
            outs.append(out.astype(jnp.float32))
        return jnp.stack(outs, axis=0)


def foa_offset_targets(pos_boxes, matched_offsets, rotations,
                       coder_means=(0., 0.), coder_stds=(0.5, 0.5)):
    """Encoded offset targets per FOA branch.

    reference: ``offset_head_expand_feature.py:271-344`` — rotate the GT
    offset with the branch angle; for 90/270 the x/y roles swap *inside*
    the encode (normalise rotated-x by proposal height etc.).

    Returns ``(E, P, 2)``.
    """
    outs = []
    for angle in rotations:
        rot = offset_rotate(matched_offsets, angle)
        if _branch_swaps_xy(angle):
            enc = offset2delta(pos_boxes, rot[..., ::-1],
                               coder_means, coder_stds)
            enc = enc[..., ::-1]
        else:
            enc = offset2delta(pos_boxes, rot, coder_means, coder_stds)
        outs.append(enc)
    return jnp.stack(outs, axis=0)


def foa_offset_fusion(offset_pred, rotations):
    """Fuse per-branch predictions (max model).

    reference: ``offset_head_expand_feature.py:346-413``.
    ``offset_pred``: ``(E, N, 2)``.  Returns ``(N, 2)``.
    """
    e = offset_pred.shape[0]
    xs, ys = [], []
    for idx in range(e):
        if _branch_swaps_xy(rotations[idx]):
            xs.append(offset_pred[idx, :, 1])
            ys.append(offset_pred[idx, :, 0])
        else:
            xs.append(offset_pred[idx, :, 0])
            ys.append(offset_pred[idx, :, 1])
    vx = jnp.max(jnp.abs(jnp.stack(xs, -1)), axis=-1)
    vy = jnp.max(jnp.abs(jnp.stack(ys, -1)), axis=-1)
    main = offset_pred[0]
    polarity = jnp.where(main > 0, 1.0, -1.0)
    return jnp.stack([vx, vy], axis=-1) * polarity
