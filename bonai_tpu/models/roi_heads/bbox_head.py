"""Box head (Shared2FCBBoxHead) + static-shape target generation.

reference: ``mmdet/models/roi_heads/bbox_heads/bbox_head.py:84-334`` and
``convfc_bbox_head.py:177-191``.  v2.3 label convention: foreground labels
are 0..C-1, background label == C (the *last* softmax channel).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...core.boxes import bbox2delta


class Shared2FCBBoxHead(nn.Module):
    """Shared ConvFC box head.  Defaults give the reference
    ``Shared2FCBBoxHead`` (``convfc_bbox_head.py:177-191``);
    ``num_shared_convs=4, num_shared_fcs=1, conv_out_channels=256`` with a
    GN ``norm_cfg`` gives ``Shared4Conv1FCBBoxHead`` (``:194-211``, the
    gn / gn+ws config families)."""
    num_classes: int = 1
    in_channels: int = 256
    fc_out_channels: int = 1024
    roi_feat_size: int = 7
    reg_class_agnostic: bool = False
    with_reg: bool = True        # Grid R-CNN: cls-only head (with_reg=False)
    num_shared_convs: int = 0
    num_shared_fcs: int = 2
    conv_out_channels: int = 256
    # plain BBoxHead with_avg_pool (reference bbox_head.py:24-36; the C4
    # configs): global-average-pool the RoI map before the linear heads
    with_avg_pool: bool = False
    norm_cfg: Any = None
    conv_cfg: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (N, S, S, C) RoI features -> (cls_score (N, C+1), bbox_pred)."""
        n = x.shape[0]
        xavier = nn.initializers.xavier_uniform()
        if self.num_shared_convs:
            from ..necks.fpn import conv_module
            for i in range(self.num_shared_convs):
                x = nn.relu(conv_module(
                    x, self.conv_out_channels, 3, f"shared_conv{i + 1}",
                    self.dtype, norm_cfg=self.norm_cfg,
                    conv_cfg=self.conv_cfg))
        if self.with_avg_pool:
            x = x.mean(axis=(1, 2))
        x = x.reshape(n, -1)
        for i in range(self.num_shared_fcs):
            x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                                 kernel_init=xavier,
                                 name=f"shared_fc{i + 1}")(x))
        cls_score = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name="fc_cls")(x)
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        if not self.with_reg:
            # zero deltas decode to the proposal itself (identity refine);
            # the detector drops loss_bbox (reference GridRCNN config
            # ``with_reg=False`` — localisation comes from the grid head)
            return cls_score.astype(jnp.float32), jnp.zeros(
                (n, reg_dim), jnp.float32)
        bbox_pred = nn.Dense(reg_dim, dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.001),
                             name="fc_reg")(x)
        return cls_score.astype(jnp.float32), bbox_pred.astype(jnp.float32)


def bbox_targets_single(sampled_boxes, sample_res, gt_bboxes, gt_labels,
                        num_classes, target_means, target_stds,
                        legacy=False):
    """Targets for one image's fixed-size sample (vmap over batch).

    reference: ``bbox_head.py:84-139`` (``_get_target_single``).

    Args:
      sampled_boxes: ``(S, 4)`` sampled proposals.
      sample_res: dict from :func:`bonai_tpu.core.samplers.random_sample`.
      gt_bboxes / gt_labels: padded ``(G, 4)`` / ``(G,)``.

    Returns labels (int32, bg == num_classes), label_weights, bbox_targets,
    bbox_weights — all ``(S, ...)``.
    """
    is_pos = sample_res["is_pos"]
    valid = sample_res["valid"]
    matched = sample_res["pos_gt_inds"]
    labels = jnp.where(is_pos, gt_labels[matched], num_classes)
    labels = labels.astype(jnp.int32)
    label_weights = valid.astype(jnp.float32)
    deltas = bbox2delta(sampled_boxes, gt_bboxes[matched],
                        target_means, target_stds, legacy=legacy)
    w = is_pos.astype(jnp.float32)[:, None]
    bbox_targets = deltas * w
    bbox_weights = jnp.broadcast_to(w, deltas.shape)
    return labels, label_weights, bbox_targets, bbox_weights


class DoubleConvFCBBoxHead(nn.Module):
    """Double-Head R-CNN bbox head (reference
    ``mmdet/models/roi_heads/bbox_heads/double_bbox_head.py``; arXiv
    1904.06493): classification from an FC branch on the cls RoI feats,
    regression from a residual conv branch (BasicResBlock + bottlenecks
    + global average pool) on the reg RoI feats.

    Norm note: the reference trains BatchNorm inside the conv branch;
    here the norms are affine-trainable frozen-stats BN like the rest of
    the detection stack (stats never update — a documented deviation
    that keeps the head a pure function of params)."""
    num_classes: int = 1
    num_convs: int = 4
    num_fcs: int = 2
    in_channels: int = 256
    conv_out_channels: int = 1024
    fc_out_channels: int = 1024
    reg_class_agnostic: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_cls, x_reg=None):
        from ..backbones.resnet import Bottleneck, FrozenBatchNorm, conv
        if x_reg is None:
            x_reg = x_cls
        n = x_cls.shape[0]
        xavier = nn.initializers.xavier_uniform()

        # conv branch (reg): BasicResBlock in_ch -> conv_out, then
        # bottlenecks at conv_out//4 planes
        ident = conv(self.conv_out_channels, 1, 1, 0, "res_ds_conv",
                     self.dtype)(x_reg)
        ident = FrozenBatchNorm(dtype=self.dtype, name="res_ds_bn")(ident)
        t = conv(self.in_channels, 3, 1, 1, "res_conv1", self.dtype)(x_reg)
        t = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="res_bn1")(t))
        t = conv(self.conv_out_channels, 1, 1, 0, "res_conv2",
                 self.dtype)(t)
        t = FrozenBatchNorm(dtype=self.dtype, name="res_bn2")(t)
        xc = nn.relu(t + ident)
        for i in range(self.num_convs):
            xc = Bottleneck(planes=self.conv_out_channels // 4,
                            dtype=self.dtype, name=f"conv_branch_{i}")(xc)
        xc = jnp.mean(xc, axis=(1, 2))                   # global avg pool
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        bbox_pred = nn.Dense(reg_dim, dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.001),
                             name="fc_reg")(xc)

        # fc branch (cls)
        xf = x_cls.reshape(n, -1)
        for i in range(self.num_fcs):
            xf = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                                  kernel_init=xavier,
                                  name=f"fc_branch_{i}")(xf))
        cls_score = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                             kernel_init=nn.initializers.normal(0.01),
                             name="fc_cls")(xf)
        return cls_score.astype(jnp.float32), bbox_pred.astype(jnp.float32)


def scale_rois(rois, scale_factor):
    """Scale RoI boxes about their centers (reference ``mmcv`` RoIAlign
    ``roi_scale_factor`` used by Double-Head's reg branch)."""
    cx = (rois[:, 1] + rois[:, 3]) * 0.5
    cy = (rois[:, 2] + rois[:, 4]) * 0.5
    hw = (rois[:, 3] - rois[:, 1]) * 0.5 * scale_factor
    hh = (rois[:, 4] - rois[:, 2]) * 0.5 * scale_factor
    return jnp.stack([rois[:, 0], cx - hw, cy - hh, cx + hw, cy + hh], -1)
