"""RetinaNet head + single-stage target/loss/decode path.

reference: ``mmdet/models/dense_heads/retina_head.py`` +
``anchor_head.py`` with FocalLoss (no sampling: all non-ignored anchors
contribute, normalised by the positive count).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.assigners import max_iou_assign
from ...core.boxes import bbox2delta, delta2bbox, clip_boxes
from ...core.nms import multiclass_nms
from ..losses import sigmoid_focal_loss, l1_loss


class RetinaHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_anchors: int = 9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        init = nn.initializers.normal(0.01)
        # bias init so initial fg prob ~= 0.01 (focal-loss convention)
        import math
        bias_cls = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
        cls_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1), (1, 1)], dtype=self.dtype,
                             kernel_init=init, name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1), (1, 1)], dtype=self.dtype,
                             kernel_init=init, name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        cls_out = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                          padding=[(1, 1), (1, 1)], dtype=self.dtype,
                          kernel_init=init, bias_init=bias_cls,
                          name="retina_cls")
        reg_out = nn.Conv(self.num_anchors * 4, (3, 3),
                          padding=[(1, 1), (1, 1)], dtype=self.dtype,
                          kernel_init=init, name="retina_reg")
        cls_scores, bbox_preds = [], []
        for x in feats:
            c = r = x
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in reg_convs:
                r = nn.relu(conv(r))
            cls_scores.append(cls_out(c))
            bbox_preds.append(reg_out(r))
        return cls_scores, bbox_preds


class RetinaSepBNHead(nn.Module):
    """RetinaNet head with conv weights SHARED across pyramid levels but
    a SEPARATE BatchNorm per level (reference
    ``mmdet/models/dense_heads/retina_sepbn_head.py``; the nas_fpn
    crop640 configs).  BN runs frozen-eval like every BN in this
    framework (batch stats are importable, not trained)."""

    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_anchors: int = 9
    num_ins: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        from ..backbones.resnet import FrozenBatchNorm
        init = nn.initializers.normal(0.01)
        import math
        bias_cls = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
        cls_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1), (1, 1)], dtype=self.dtype,
                             use_bias=False, kernel_init=init,
                             name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1), (1, 1)], dtype=self.dtype,
                             use_bias=False, kernel_init=init,
                             name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        cls_out = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                          padding=[(1, 1), (1, 1)], dtype=self.dtype,
                          kernel_init=init, bias_init=bias_cls,
                          name="retina_cls")
        reg_out = nn.Conv(self.num_anchors * 4, (3, 3),
                          padding=[(1, 1), (1, 1)], dtype=self.dtype,
                          kernel_init=init, name="retina_reg")
        cls_scores, bbox_preds = [], []
        for li, x in enumerate(feats):
            c = r = x
            for i in range(self.stacked_convs):
                c = nn.relu(FrozenBatchNorm(
                    dtype=self.dtype,
                    name=f"cls_bn_l{li}_c{i}")(cls_convs[i](c)))
                r = nn.relu(FrozenBatchNorm(
                    dtype=self.dtype,
                    name=f"reg_bn_l{li}_c{i}")(reg_convs[i](r)))
            cls_scores.append(cls_out(c))
            bbox_preds.append(reg_out(r))
        return cls_scores, bbox_preds


def retina_targets(anchors, gt_bboxes, gt_valid, gt_labels, num_classes,
                   assigner_cfg):
    """All-anchor targets (no sampling) for one image."""
    assigned, _ = max_iou_assign(
        anchors, gt_bboxes, gt_valid,
        pos_iou_thr=assigner_cfg.get("pos_iou_thr", 0.5),
        neg_iou_thr=assigner_cfg.get("neg_iou_thr", 0.4),
        min_pos_iou=assigner_cfg.get("min_pos_iou", 0.0),
        match_low_quality=assigner_cfg.get("match_low_quality", True))
    is_pos = assigned > 0
    matched = jnp.maximum(assigned - 1, 0)
    onehot = jax.nn.one_hot(gt_labels[matched], num_classes) * \
        is_pos[:, None]
    cls_w = (assigned >= 0).astype(jnp.float32)
    deltas = bbox2delta(anchors, gt_bboxes[matched])
    reg_w = is_pos.astype(jnp.float32)[:, None]
    aux = dict(is_pos=is_pos, matched=matched,
               labels=gt_labels[matched],
               gt_boxes=gt_bboxes[matched])
    return (onehot, cls_w, deltas * reg_w,
            jnp.broadcast_to(reg_w, deltas.shape),
            jnp.sum(is_pos.astype(jnp.float32)), aux)


def retina_loss(cls_scores, bbox_preds, anchors_flat, gt_bboxes, gt_valid,
                gt_labels, num_classes, train_cfg, gamma=2.0, alpha=0.25,
                loss_cls_cfg=None, loss_bbox_cfg=None, pisa_cfg=None):
    """``loss_cls_cfg``/``loss_bbox_cfg``: optional registry configs
    replacing the focal / L1 defaults (GHM-C / GHM-R, reference
    ``configs/ghm``).  ``pisa_cfg``: ``dict(isr=..., carl=...)`` applies
    ISR-P cls reweighting and the CARL regression term over all-anchor
    targets (reference ``pisa_retinanet_head.py:24-93``)."""
    b = cls_scores[0].shape[0]
    cls_flat = jnp.concatenate(
        [s.reshape(b, -1, num_classes) for s in cls_scores],
        axis=1).astype(jnp.float32)
    reg_flat = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in bbox_preds], axis=1).astype(jnp.float32)
    onehot, cls_w, bt, bw, npos, aux = jax.vmap(
        lambda gb, gv, gl: retina_targets(
            anchors_flat, gb, gv, gl, num_classes,
            dict(train_cfg["assigner"])))(gt_bboxes, gt_valid, gt_labels)
    total_pos = jnp.maximum(jnp.sum(npos), 1.0)
    extra = {}
    if pisa_cfg:
        from ..losses import carl_loss, isr_p
        b_, a_ = cls_flat.shape[:2]
        G = gt_bboxes.shape[1]
        pos_mask = aux["is_pos"].reshape(-1)
        labels_f = aux["labels"].reshape(-1)
        # offset matched-gt ids per image so IoU-HLR groups don't mix
        # instances across the batch
        matched_f = (aux["matched"]
                     + jnp.arange(b_)[:, None] * G).reshape(-1)
        anc = jnp.broadcast_to(anchors_flat[None], (b_,) +
                               anchors_flat.shape).reshape(-1, 4)
        dec = delta2bbox(anc, reg_flat.reshape(-1, 4), (0.,) * 4,
                         (1.,) * 4)
        gtb = aux["gt_boxes"].reshape(-1, 4)
        ix1 = jnp.maximum(dec[:, 0], gtb[:, 0])
        iy1 = jnp.maximum(dec[:, 1], gtb[:, 1])
        ix2 = jnp.minimum(dec[:, 2], gtb[:, 2])
        iy2 = jnp.minimum(dec[:, 3], gtb[:, 3])
        inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)

        def _area(v):
            return jnp.clip(v[:, 2] - v[:, 0], 0) * \
                jnp.clip(v[:, 3] - v[:, 1], 0)

        ious = inter / jnp.maximum(_area(dec) + _area(gtb) - inter, 1e-6)
        isr = dict(pisa_cfg.get("isr") or {})
        cls_w_f = cls_w.reshape(-1)
        if isr:
            focal_raw = jax.lax.stop_gradient(sigmoid_focal_loss(
                cls_flat, onehot, gamma, alpha,
                reduction="none")).sum(-1).reshape(-1)
            cls_w_f = isr_p(cls_w_f, ious, pos_mask, labels_f, matched_f,
                            jnp.where(pos_mask, focal_raw, 0.0),
                            k=isr.get("k", 2.0), bias=isr.get("bias", 0.0))
            cls_w = cls_w_f.reshape(b_, a_)
        carl = dict(pisa_cfg.get("carl") or {})
        if carl:
            prob = jax.nn.sigmoid(cls_flat).reshape(-1, num_classes)
            pos_prob = jnp.take_along_axis(
                prob, jnp.clip(labels_f, 0, num_classes - 1)[:, None],
                axis=1)[:, 0]
            reg_raw = jnp.abs(reg_flat.reshape(-1, 4)
                              - bt.reshape(-1, 4)) * \
                bw.reshape(-1, 4)
            extra["loss_carl"] = carl.get("loss_weight", 5.0) * carl_loss(
                pos_prob, pos_mask, reg_raw, k=carl.get("k", 1.0),
                bias=carl.get("bias", 0.2), avg_factor=total_pos)
    if loss_cls_cfg:
        from ..losses import build_loss
        loss_cls = build_loss(dict(loss_cls_cfg))(
            cls_flat, onehot,
            jnp.broadcast_to(cls_w[..., None], cls_flat.shape),
            avg_factor=total_pos)
    else:
        loss_cls = sigmoid_focal_loss(cls_flat, onehot, gamma, alpha,
                                      cls_w[..., None],
                                      avg_factor=total_pos)
    if loss_bbox_cfg:
        from ..losses import build_loss
        loss_bbox = build_loss(dict(loss_bbox_cfg))(
            reg_flat, bt, bw, avg_factor=total_pos)
    else:
        loss_bbox = l1_loss(reg_flat, bt, bw, avg_factor=total_pos)
    return {"loss_cls": loss_cls, "loss_bbox": loss_bbox, **extra}


def retina_bboxes_single(cls_scores, bbox_preds, anchors_levels, img_shape,
                         num_classes, cfg):
    """Single-image decode (vmap over batch): per-level top-k, decode,
    multiclass NMS."""
    nms_pre = cfg.get("nms_pre", 1000)
    boxes_all, scores_all = [], []
    for scores, deltas, anchors in zip(cls_scores, bbox_preds,
                                       anchors_levels):
        s = jax.nn.sigmoid(
            scores.reshape(-1, num_classes).astype(jnp.float32))
        d = deltas.reshape(-1, 4).astype(jnp.float32)
        n = s.shape[0]
        if n > nms_pre:
            best = jnp.max(s, axis=1)
            _, idx = jax.lax.top_k(best, nms_pre)
            s = s[idx]
            d = d[idx]
            a = anchors[idx]
        else:
            a = anchors
        boxes = clip_boxes(delta2bbox(a, d, means=(0.,) * 4,
                                      stds=cfg.get("bbox_std",
                                                   (1., 1., 1., 1.))),
                           img_shape)
        boxes_all.append(boxes)
        scores_all.append(s)
    boxes = jnp.concatenate(boxes_all, axis=0)
    scores = jnp.concatenate(scores_all, axis=0)
    # background column for multiclass_nms (sigmoid heads have none)
    scores = jnp.concatenate(
        [scores, jnp.zeros((scores.shape[0], 1), scores.dtype)], axis=1)
    return multiclass_nms(boxes, scores, cfg.get("score_thr", 0.05),
                          dict(cfg.get("nms", dict(type="nms",
                                                   iou_threshold=0.5))),
                          cfg.get("max_per_img", 100))
