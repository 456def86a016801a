"""FCN mask head.

reference: ``mmdet/models/roi_heads/mask_heads/fcn_mask_head.py:22-127`` —
``num_convs`` 3x3 convs, 2x deconv, 1x1 class logits.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class FCNMaskHead(nn.Module):
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 1
    norm_cfg: Any = None       # GN for the gn config families (reference
                               # fcn_mask_head.py ``norm_cfg``)
    conv_cfg: Any = None
    upsample_type: str = "deconv"  # 'carafe' for the carafe family
                                   # (reference configs/carafe mask_head
                                   # ``upsample_cfg=dict(type='carafe')``)
    upsample_cfg: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (N, S, S, C) -> mask logits (N, 2S, 2S, num_classes)."""
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        from ..necks.fpn import conv_module
        for i in range(self.num_convs):
            if self.norm_cfg is not None or self.conv_cfg is not None:
                x = conv_module(x, self.conv_out_channels, 3, f"conv{i}",
                                self.dtype, norm_cfg=self.norm_cfg,
                                conv_cfg=self.conv_cfg)
            else:
                x = nn.Conv(self.conv_out_channels, (3, 3),
                            padding=[(1, 1), (1, 1)], dtype=self.dtype,
                            kernel_init=kaiming, name=f"conv{i}")(x)
            x = nn.relu(x)
        if self.upsample_type == "carafe":
            from ...ops.carafe import CARAFEPack
            up = dict(self.upsample_cfg or {})
            x = CARAFEPack(channels=self.conv_out_channels,
                           scale_factor=up.get("scale_factor", 2),
                           up_kernel=up.get("up_kernel", 5),
                           up_group=up.get("up_group", 1),
                           encoder_kernel=up.get("encoder_kernel", 3),
                           encoder_dilation=up.get("encoder_dilation", 1),
                           compressed_channels=up.get("compressed_channels",
                                                      64),
                           dtype=self.dtype, name="upsample")(x)
        else:
            x = nn.ConvTranspose(self.conv_out_channels, (2, 2),
                                 strides=(2, 2), dtype=self.dtype,
                                 kernel_init=kaiming, name="upsample")(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    kernel_init=kaiming, name="conv_logits")(x)
        return x.astype(jnp.float32)


class HTCMaskHead(nn.Module):
    """HTC mask head with information flow (reference
    ``mmdet/models/roi_heads/mask_heads/htc_mask_head.py``): a 1x1
    ``conv_res`` injects the previous stage's mask feature before the
    conv tower; callers may request the pre-upsample feature for the
    next stage."""
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, res_feat=None, return_logits=True,
                 return_feat=True):
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        if res_feat is not None:
            r = nn.Conv(self.conv_out_channels, (1, 1), dtype=self.dtype,
                        kernel_init=kaiming, name="conv_res")(res_feat)
            x = x + r
        for i in range(self.num_convs):
            x = nn.Conv(self.conv_out_channels, (3, 3),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        kernel_init=kaiming, name=f"conv{i}")(x)
            x = nn.relu(x)
        feat = x
        outs = []
        if return_logits:
            u = nn.ConvTranspose(self.conv_out_channels, (2, 2),
                                 strides=(2, 2), dtype=self.dtype,
                                 kernel_init=kaiming, name="upsample")(x)
            u = nn.relu(u)
            logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                             kernel_init=kaiming, name="conv_logits")(u)
            outs.append(logits.astype(jnp.float32))
        if return_feat:
            outs.append(feat)
        return outs[0] if len(outs) == 1 else tuple(outs)


class FusedSemanticHead(nn.Module):
    """HTC semantic branch (reference
    ``mmdet/models/roi_heads/mask_heads/fused_semantic_head.py``):
    lateral 1x1 convs on every FPN level resized-added onto
    ``fusion_level``, a conv tower, then a segmentation logit conv and
    an embedding conv whose output fuses into the RoI features."""
    num_ins: int = 5
    fusion_level: int = 1
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 183
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        import jax
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        target = feats[self.fusion_level]
        h, w = target.shape[1], target.shape[2]
        fused = nn.Conv(self.in_channels, (1, 1), dtype=self.dtype,
                        kernel_init=kaiming,
                        name=f"lateral{self.fusion_level}")(target)
        for i, f in enumerate(feats[:self.num_ins]):
            if i == self.fusion_level:
                continue
            lat = nn.Conv(self.in_channels, (1, 1), dtype=self.dtype,
                          kernel_init=kaiming, name=f"lateral{i}")(f)
            lat = jax.image.resize(lat, (lat.shape[0], h, w, lat.shape[3]),
                                   method="bilinear")
            fused = fused + lat
        x = fused
        for i in range(self.num_convs):
            x = nn.Conv(self.conv_out_channels, (3, 3),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        kernel_init=kaiming, name=f"conv{i}")(x)
            x = nn.relu(x)
        embedding = nn.relu(nn.Conv(self.conv_out_channels, (1, 1),
                                    dtype=self.dtype, kernel_init=kaiming,
                                    name="conv_embedding")(x))
        logits = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                         kernel_init=kaiming, name="conv_logits")(x)
        return logits.astype(jnp.float32), embedding


class MaskIoUHead(nn.Module):
    """Mask Scoring R-CNN IoU head (reference
    ``mmdet/models/roi_heads/mask_heads/maskiou_head.py``; arXiv
    1903.00241): mask features concat the max-pooled mask prediction,
    a conv tower (last conv stride 2) + FCs regress the predicted
    mask's IoU with its gt, which rescores the segmentation."""
    num_convs: int = 4
    num_fcs: int = 2
    in_channels: int = 256
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    num_classes: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mask_feat, mask_logits):
        """mask_feat (N, S, S, C); mask_logits (N, 2S, 2S, nc)."""
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        pred = jnp.max(mask_logits, axis=-1, keepdims=True)
        pred = nn.max_pool(pred, (2, 2), strides=(2, 2))
        x = jnp.concatenate([mask_feat.astype(self.dtype),
                             pred.astype(self.dtype)], -1)
        for i in range(self.num_convs):
            stride = 2 if i == self.num_convs - 1 else 1
            x = nn.Conv(self.conv_out_channels, (3, 3),
                        strides=(stride, stride),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        kernel_init=kaiming, name=f"conv{i}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                                 name=f"fc{i}")(x))
        out = nn.Dense(self.num_classes, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01),
                       name="fc_mask_iou")(x)
        return out.astype(jnp.float32)


def mask_iou_targets(mask_logits, targets, pos_boxes, matched_gt_boxes,
                     matched_inst_masks, mask_thr=0.5):
    """Mask-IoU regression targets (reference ``maskiou_head.py:102-176``):
    IoU between the binarised prediction (on the proposal grid) and the
    WHOLE gt instance — the gt area outside the proposal enters through
    the area ratio, computed here directly from the instance-local masks
    (full gt pixels = mean(inst_mask) * gt_box_area).

    Args:
      mask_logits ``(P, 2S, 2S)``; targets ``(P, S', S')`` binary (same
      grid as the logits after the caller resizes — here both 2S);
      pos_boxes ``(P, 4)``; matched_gt_boxes ``(P, 4)``;
      matched_inst_masks ``(P, M, M)``.
    Returns ``(P,)`` IoU targets in [0, 1].
    """
    s = targets.shape[-1]
    pred = (jax.nn.sigmoid(mask_logits) > mask_thr).astype(jnp.float32)
    overlap = jnp.sum(pred * targets, axis=(-1, -2))
    pred_area = jnp.sum(pred, axis=(-1, -2))
    pw = jnp.maximum(pos_boxes[:, 2] - pos_boxes[:, 0], 1e-6)
    ph = jnp.maximum(pos_boxes[:, 3] - pos_boxes[:, 1], 1e-6)
    cell = (pw / s) * (ph / s)
    gw = jnp.maximum(matched_gt_boxes[:, 2] - matched_gt_boxes[:, 0], 0.0)
    gh = jnp.maximum(matched_gt_boxes[:, 3] - matched_gt_boxes[:, 1], 0.0)
    full_pixels = jnp.mean(matched_inst_masks.astype(jnp.float32),
                           axis=(-1, -2)) * gw * gh
    gt_full_cells = full_pixels / jnp.maximum(cell, 1e-6)
    return overlap / jnp.maximum(pred_area + gt_full_cells - overlap, 1e-6)
