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
    return onehot, cls_w, deltas * reg_w, jnp.broadcast_to(reg_w, deltas.shape), \
        jnp.sum(is_pos.astype(jnp.float32))


def retina_loss(cls_scores, bbox_preds, anchors_flat, gt_bboxes, gt_valid,
                gt_labels, num_classes, train_cfg, gamma=2.0, alpha=0.25,
                loss_cls_cfg=None, loss_bbox_cfg=None):
    """``loss_cls_cfg``/``loss_bbox_cfg``: optional registry configs
    replacing the focal / L1 defaults (GHM-C / GHM-R, reference
    ``configs/ghm``)."""
    b = cls_scores[0].shape[0]
    cls_flat = jnp.concatenate(
        [s.reshape(b, -1, num_classes) for s in cls_scores],
        axis=1).astype(jnp.float32)
    reg_flat = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in bbox_preds], axis=1).astype(jnp.float32)
    onehot, cls_w, bt, bw, npos = jax.vmap(
        lambda gb, gv, gl: retina_targets(
            anchors_flat, gb, gv, gl, num_classes,
            dict(train_cfg["assigner"])))(gt_bboxes, gt_valid, gt_labels)
    total_pos = jnp.maximum(jnp.sum(npos), 1.0)
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
    return {"loss_cls": loss_cls, "loss_bbox": loss_bbox}


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
