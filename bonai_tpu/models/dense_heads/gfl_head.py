"""GFL: Generalized Focal Loss head (QFL + DFL + distributed boxes).

reference: ``mmdet/models/dense_heads/gfl_head.py`` (arXiv 2006.04388).
Structure is the ATSS tower (GN cls/reg towers, one anchor per cell,
ATSS assignment) with two changes:
  1) classification scores are trained with Quality Focal Loss against
     the decoded-box IoU (joint cls-quality representation);
  2) box sides are predicted as softmax DISTRIBUTIONS over the integer
     set {0..reg_max} of stride-normalised distances, trained with
     Distribution Focal Loss and decoded by the expectation (Integral).

TPU shape discipline: everything is flattened over levels once and
processed batched/masked — per-level python loops exist only at trace
time over the static level list.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.assigners import atss_assign
from ...core.nms import multiclass_nms
from ..losses import QualityFocalLoss, DistributionFocalLoss


class GFLHead(nn.Module):
    """cls/reg GN towers; reg outputs ``4 * (reg_max + 1)`` distribution
    logits scaled per level (reference ``gfl_head.py:100-148``)."""
    num_classes: int = 1
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    reg_max: int = 16
    num_levels: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        cls_convs, reg_convs, gn_c, gn_r = [], [], [], []
        for i in range(self.stacked_convs):
            cls_convs.append(nn.Conv(self.feat_channels, (3, 3),
                                     padding=[(1, 1), (1, 1)],
                                     dtype=self.dtype, kernel_init=kaiming,
                                     name=f"cls_conv{i}"))
            reg_convs.append(nn.Conv(self.feat_channels, (3, 3),
                                     padding=[(1, 1), (1, 1)],
                                     dtype=self.dtype, kernel_init=kaiming,
                                     name=f"reg_conv{i}"))
            ng = min(32, self.feat_channels)
            gn_c.append(nn.GroupNorm(num_groups=ng, dtype=self.dtype,
                                     name=f"cls_gn{i}"))
            gn_r.append(nn.GroupNorm(num_groups=ng, dtype=self.dtype,
                                     name=f"reg_gn{i}"))
        bias_init = nn.initializers.constant(
            float(-np.log((1 - 0.01) / 0.01)))
        gfl_cls = nn.Conv(self.num_classes, (3, 3),
                          padding=[(1, 1), (1, 1)], dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          bias_init=bias_init, name="gfl_cls")
        gfl_reg = nn.Conv(4 * (self.reg_max + 1), (3, 3),
                          padding=[(1, 1), (1, 1)], dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          name="gfl_reg")
        scales = [self.param(f"scale{i}", nn.initializers.ones, ())
                  for i in range(self.num_levels)]

        cls_out, reg_out = [], []
        for lvl, x in enumerate(feats):
            c = r = x
            for i in range(self.stacked_convs):
                c = nn.relu(gn_c[i](cls_convs[i](c)))
                r = nn.relu(gn_r[i](reg_convs[i](r)))
            cls_out.append(gfl_cls(c).astype(jnp.float32))
            reg_out.append(gfl_reg(r).astype(jnp.float32) * scales[lvl])
        return cls_out, reg_out


def integral(pred, reg_max):
    """Expectation of the per-side softmax distribution (reference
    ``Integral.forward``): (..., 4*(n+1)) logits -> (..., 4) distances."""
    p = pred.reshape(pred.shape[:-1] + (4, reg_max + 1))
    proj = jnp.arange(reg_max + 1, dtype=jnp.float32)
    return jnp.sum(jax.nn.softmax(p, axis=-1) * proj, axis=-1)


def _giou(a, b):
    ix1 = jnp.maximum(a[..., 0], b[..., 0])
    iy1 = jnp.maximum(a[..., 1], b[..., 1])
    ix2 = jnp.minimum(a[..., 2], b[..., 2])
    iy2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    area = lambda bx: jnp.clip(bx[..., 2] - bx[..., 0], 0) * \
        jnp.clip(bx[..., 3] - bx[..., 1], 0)
    union = jnp.maximum(area(a) + area(b) - inter, 1e-6)
    iou = inter / union
    ex1 = jnp.minimum(a[..., 0], b[..., 0])
    ey1 = jnp.minimum(a[..., 1], b[..., 1])
    ex2 = jnp.maximum(a[..., 2], b[..., 2])
    ey2 = jnp.maximum(a[..., 3], b[..., 3])
    enc = jnp.maximum((ex2 - ex1) * (ey2 - ey1), 1e-6)
    return iou, iou - (enc - union) / enc


def gfl_loss(cls_scores, bbox_preds, anchors_flat, stride_flat,
             num_level_anchors, gt_bboxes, gt_valid, gt_labels,
             num_classes, reg_max=16, topk=9, qfl_beta=2.0,
             loss_cls_weight=1.0, loss_bbox_weight=2.0,
             loss_dfl_weight=0.25):
    """Batched GFL loss (reference ``gfl_head.py:218-307``):

    - ATSS assignment over the flat anchor set;
    - QFL on (labels, decoded-IoU score) averaged by num_pos;
    - GIoU on stride-normalised decoded boxes and DFL on the two
      bracketing integer bins, both weighted by the detached max class
      probability and averaged by its positive sum.
    """
    b = cls_scores[0].shape[0]
    cls_flat = jnp.concatenate(
        [c.reshape(b, -1, num_classes) for c in cls_scores], 1)
    reg_flat = jnp.concatenate(
        [r.reshape(b, -1, 4 * (reg_max + 1)) for r in bbox_preds], 1)

    def targets_one(gb, gv, gl):
        assigned, _ = atss_assign(anchors_flat, num_level_anchors, gb, gv,
                                  topk=topk)
        matched = jnp.maximum(assigned - 1, 0)
        labels = jnp.where(assigned > 0, gl[matched], num_classes)
        return labels.astype(jnp.int32), gb[matched]

    labels, mboxes = jax.vmap(targets_one)(gt_bboxes, gt_valid, gt_labels)
    pos = labels < num_classes                              # (B, A)
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)

    centers = jnp.stack([(anchors_flat[:, 0] + anchors_flat[:, 2]) * 0.5,
                         (anchors_flat[:, 1] + anchors_flat[:, 3]) * 0.5],
                        -1)[None] / stride_flat[None, :, None]   # (1, A, 2)
    dist = integral(reg_flat, reg_max)                      # (B, A, 4)
    dec = jnp.stack([centers[..., 0] - dist[..., 0],
                     centers[..., 1] - dist[..., 1],
                     centers[..., 0] + dist[..., 2],
                     centers[..., 1] + dist[..., 3]], -1)
    tgt = mboxes / stride_flat[None, :, None]
    iou, giou = _giou(dec, tgt)

    # joint quality target: IoU of the decoded box (detached)
    score = jnp.where(pos, jax.lax.stop_gradient(iou), 0.0)
    qfl = QualityFocalLoss(beta=qfl_beta, reduction="none",
                           loss_weight=1.0)
    loss_cls = loss_cls_weight * jnp.sum(
        qfl(cls_flat, (labels, score))) / num_pos

    wt = jnp.max(jax.lax.stop_gradient(jax.nn.sigmoid(cls_flat)), -1)
    wt = jnp.where(pos, wt, 0.0)                            # (B, A)
    wsum = jnp.maximum(jnp.sum(wt), 1e-6)
    loss_bbox = loss_bbox_weight * jnp.sum((1.0 - giou) * wt) / wsum

    # DFL on the stride-normalised side distances
    tdist = jnp.stack([centers[..., 0] - tgt[..., 0],
                       centers[..., 1] - tgt[..., 1],
                       tgt[..., 2] - centers[..., 0],
                       tgt[..., 3] - centers[..., 1]], -1)
    tdist = jnp.clip(tdist, 0, reg_max - 0.1)
    dfl = DistributionFocalLoss(reduction="none", loss_weight=1.0)
    per_side = dfl(reg_flat.reshape(b, -1, 4, reg_max + 1), tdist)
    loss_dfl = loss_dfl_weight * jnp.sum(
        per_side * wt[..., None]) / (4.0 * wsum)
    return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
            "loss_dfl": loss_dfl}


def gfl_bboxes_single(cls_scores, bbox_preds, anchors_levels, strides,
                      img_shape, num_classes, cfg, reg_max=16):
    """Single-image GFL inference (reference ``gfl_head.py:309-388``)."""
    nms_pre = int(cfg.get("nms_pre", 1000))
    boxes_all, scores_all = [], []
    for cs, bp, anc, st in zip(cls_scores, bbox_preds, anchors_levels,
                               strides):
        c = cs.reshape(-1, num_classes)
        r = bp.reshape(-1, 4 * (reg_max + 1))
        s = jax.nn.sigmoid(c)
        k = min(nms_pre, s.shape[0])
        _, idx = jax.lax.top_k(jnp.max(s, -1), k)
        a = anc[idx]
        centers = jnp.stack([(a[:, 0] + a[:, 2]) * 0.5,
                             (a[:, 1] + a[:, 3]) * 0.5], -1)
        dist = integral(r[idx], reg_max) * st
        boxes = jnp.stack([centers[:, 0] - dist[:, 0],
                           centers[:, 1] - dist[:, 1],
                           centers[:, 0] + dist[:, 2],
                           centers[:, 1] + dist[:, 3]], -1)
        boxes = jnp.stack([
            jnp.clip(boxes[:, 0], 0, img_shape[1]),
            jnp.clip(boxes[:, 1], 0, img_shape[0]),
            jnp.clip(boxes[:, 2], 0, img_shape[1]),
            jnp.clip(boxes[:, 3], 0, img_shape[0])], -1)
        boxes_all.append(boxes)
        scores_all.append(s[idx])
    boxes = jnp.concatenate(boxes_all, 0)
    scores = jnp.concatenate(scores_all, 0)
    scores = jnp.concatenate(
        [scores, jnp.zeros((scores.shape[0], 1))], -1)
    return multiclass_nms(boxes, scores, cfg.get("score_thr", 0.05),
                          dict(cfg.get("nms", dict(type="nms",
                                                   iou_threshold=0.6))),
                          cfg.get("max_per_img", 100))
