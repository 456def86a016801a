"""ATSS: anchor-based one-stage head with adaptive sample selection.

reference: ``mmdet/models/dense_heads/atss_head.py`` +
``mmdet/core/bbox/assigners/atss_assigner.py`` (arXiv 1912.02424).
Structure mirrors the FCOS head (GN towers + centerness) but predictions
are anchor deltas; targets come from :func:`bonai_tpu.core.assigners.
atss_assign` — batched and static-shape like every other head here.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.assigners import atss_assign
from ...core.boxes import delta2bbox
from ...core.nms import multiclass_nms
from ..losses import binary_cross_entropy, sigmoid_focal_loss


class ATSSHead(nn.Module):
    """cls/reg towers with GroupNorm + centerness on the reg tower
    (reference ``atss_head.py:60-140``; one anchor per cell)."""
    num_classes: int = 1
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
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
            gn_c.append(nn.GroupNorm(num_groups=32, dtype=self.dtype,
                                     name=f"cls_gn{i}"))
            gn_r.append(nn.GroupNorm(num_groups=32, dtype=self.dtype,
                                     name=f"reg_gn{i}"))
        bias_init = nn.initializers.constant(
            float(-np.log((1 - 0.01) / 0.01)))
        conv_cls = nn.Conv(self.num_classes, (3, 3),
                           padding=[(1, 1), (1, 1)], dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=bias_init, name="atss_cls")
        conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name="atss_reg")
        conv_ctr = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name="atss_centerness")
        scales = [self.param(f"scale{i}", nn.initializers.ones, ())
                  for i in range(self.num_levels)]

        cls_out, reg_out, ctr_out = [], [], []
        for lvl, x in enumerate(feats):
            c = r = x
            for i in range(self.stacked_convs):
                c = nn.relu(gn_c[i](cls_convs[i](c)))
                r = nn.relu(gn_r[i](reg_convs[i](r)))
            cls_out.append(conv_cls(c).astype(jnp.float32))
            reg_out.append(conv_reg(r).astype(jnp.float32) * scales[lvl])
            ctr_out.append(conv_ctr(r).astype(jnp.float32))
        return cls_out, reg_out, ctr_out


def atss_centerness_target(anchors, gt_boxes):
    """Centerness of the matched gt wrt the ANCHOR center (reference
    ``atss_head.py`` ``centerness_target``)."""
    acx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    acy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    l_ = acx - gt_boxes[:, 0]
    r_ = gt_boxes[:, 2] - acx
    t_ = acy - gt_boxes[:, 1]
    b_ = gt_boxes[:, 3] - acy
    lr = jnp.stack([l_, r_], -1)
    tb = jnp.stack([t_, b_], -1)
    ctr = jnp.sqrt(jnp.clip(
        (jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), 1e-6))
        * (jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), 1e-6)), 0.0))
    return ctr


def atss_loss(cls_scores, bbox_preds, centernesses, anchors_flat,
              num_level_anchors, gt_bboxes, gt_valid, gt_labels,
              num_classes, topk=9, target_means=(0.,) * 4,
              target_stds=(0.1, 0.1, 0.2, 0.2), gamma=2.0, alpha=0.25,
              loss_bbox_weight=2.0):
    """Batched ATSS loss (reference ``atss_head.py:190-294``): focal cls
    averaged by num_pos, GIoU on decoded boxes weighted by the centerness
    target and averaged by its sum, BCE centerness."""
    b = cls_scores[0].shape[0]
    cls_flat = jnp.concatenate(
        [c.reshape(b, -1, num_classes) for c in cls_scores], 1)
    reg_flat = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in bbox_preds], 1)
    ctr_flat = jnp.concatenate(
        [c.reshape(b, -1) for c in centernesses], 1)

    def targets_one(gb, gv, gl):
        assigned, _ = atss_assign(anchors_flat, num_level_anchors, gb, gv,
                                  topk=topk)
        matched = jnp.maximum(assigned - 1, 0)
        labels = jnp.where(assigned > 0, gl[matched], num_classes)
        boxes = gb[matched]
        return labels.astype(jnp.int32), boxes

    labels, mboxes = jax.vmap(targets_one)(gt_bboxes, gt_valid, gt_labels)
    pos = labels < num_classes                              # (B, A)
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)

    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    loss_cls = sigmoid_focal_loss(cls_flat, onehot, gamma, alpha,
                                  avg_factor=num_pos)

    anc = jnp.broadcast_to(anchors_flat[None], (b,) + anchors_flat.shape)
    dec = jax.vmap(lambda a_, d_: delta2bbox(a_, d_, target_means,
                                             target_stds))(anc, reg_flat)
    ctr_t = jax.vmap(atss_centerness_target)(anc, mboxes)   # (B, A)
    ix1 = jnp.maximum(dec[..., 0], mboxes[..., 0])
    iy1 = jnp.maximum(dec[..., 1], mboxes[..., 1])
    ix2 = jnp.minimum(dec[..., 2], mboxes[..., 2])
    iy2 = jnp.minimum(dec[..., 3], mboxes[..., 3])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    area = lambda bx: jnp.clip(bx[..., 2] - bx[..., 0], 0) * \
        jnp.clip(bx[..., 3] - bx[..., 1], 0)
    union = jnp.maximum(area(dec) + area(mboxes) - inter, 1e-6)
    iou = inter / union
    ex1 = jnp.minimum(dec[..., 0], mboxes[..., 0])
    ey1 = jnp.minimum(dec[..., 1], mboxes[..., 1])
    ex2 = jnp.maximum(dec[..., 2], mboxes[..., 2])
    ey2 = jnp.maximum(dec[..., 3], mboxes[..., 3])
    enc = jnp.maximum((ex2 - ex1) * (ey2 - ey1), 1e-6)
    giou = iou - (enc - union) / enc
    w = ctr_t * pos
    loss_bbox = loss_bbox_weight * \
        jnp.sum((1.0 - giou) * w) / jnp.maximum(jnp.sum(w), 1e-6)

    loss_ctr = binary_cross_entropy(ctr_flat, ctr_t,
                                    pos.astype(jnp.float32),
                                    avg_factor=num_pos)
    return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
            "loss_centerness": loss_ctr}


def atss_bboxes_single(cls_scores, bbox_preds, centernesses,
                       anchors_levels, img_shape, num_classes, cfg,
                       target_means=(0.,) * 4,
                       target_stds=(0.1, 0.1, 0.2, 0.2)):
    """Single-image ATSS inference (vmap over batch)."""
    nms_pre = int(cfg.get("nms_pre", 1000))
    boxes_all, scores_all, ctr_all = [], [], []
    for cs, bp, cn, anc in zip(cls_scores, bbox_preds, centernesses,
                               anchors_levels):
        c = cs.reshape(-1, num_classes)
        r = bp.reshape(-1, 4)
        n = jax.nn.sigmoid(cn.reshape(-1))
        s = jax.nn.sigmoid(c)
        k = min(nms_pre, s.shape[0])
        rank = jnp.max(s, -1) * n
        _, idx = jax.lax.top_k(rank, k)
        boxes = delta2bbox(anc[idx], r[idx], target_means, target_stds,
                           max_shape=img_shape)
        boxes_all.append(boxes)
        scores_all.append(s[idx])
        ctr_all.append(n[idx])
    boxes = jnp.concatenate(boxes_all, 0)
    scores = jnp.concatenate(scores_all, 0) \
        * jnp.concatenate(ctr_all, 0)[:, None]
    scores = jnp.concatenate(
        [scores, jnp.zeros((scores.shape[0], 1))], -1)
    return multiclass_nms(boxes, scores, cfg.get("score_thr", 0.05),
                          dict(cfg.get("nms", dict(type="nms",
                                                   iou_threshold=0.6))),
                          cfg.get("max_per_img", 100))
