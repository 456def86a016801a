"""SSD head: per-level softmax classifiers + box regressors with
online hard-negative mining.

reference: ``mmdet/models/dense_heads/ssd_head.py`` (MultiBox loss:
softmax CE over C+1 classes with background LAST, negatives mined at
``neg_pos_ratio``:1 by descending cls loss, SmoothL1 on deltas).

TPU redesign: the reference's per-image ``nonzero()`` + dynamic top-k
over negatives becomes a static rank mask — sort the per-anchor neg
losses once and keep ranks ``< min(ratio * npos, nneg)``; shapes stay
fixed so the whole loss jits as one fused program.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.assigners import max_iou_assign
from ...core.boxes import bbox2delta, delta2bbox, clip_boxes
from ...core.nms import multiclass_nms
from ..losses import smooth_l1_loss


class SSDHead(nn.Module):
    """Per-level 3x3 conv pairs (cls / reg); levels differ in both input
    channels and anchor count (reference ``ssd_head.py:60-78``)."""
    num_classes: int = 80
    in_channels: Sequence[int] = (512, 1024, 512, 256, 256, 256)
    num_anchors: Sequence[int] = (4, 6, 6, 6, 4, 4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        xavier = nn.initializers.xavier_uniform()
        cls_scores, bbox_preds = [], []
        for i, x in enumerate(feats):
            a = self.num_anchors[i]
            cls_scores.append(nn.Conv(
                a * (self.num_classes + 1), (3, 3),
                padding=[(1, 1), (1, 1)], dtype=self.dtype,
                kernel_init=xavier, name=f"cls_conv{i}")(x))
            bbox_preds.append(nn.Conv(
                a * 4, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                kernel_init=xavier, name=f"reg_conv{i}")(x))
        return cls_scores, bbox_preds


def ssd_targets(anchors, gt_bboxes, gt_valid, gt_labels, num_classes,
                assigner_cfg, target_stds, legacy=False):
    """One image: labels (bg = num_classes), deltas, weights."""
    assigned, _ = max_iou_assign(
        anchors, gt_bboxes, gt_valid,
        pos_iou_thr=assigner_cfg.get("pos_iou_thr", 0.5),
        neg_iou_thr=assigner_cfg.get("neg_iou_thr", 0.5),
        min_pos_iou=assigner_cfg.get("min_pos_iou", 0.0),
        match_low_quality=assigner_cfg.get("match_low_quality", True))
    is_pos = assigned > 0
    matched = jnp.maximum(assigned - 1, 0)
    labels = jnp.where(is_pos, gt_labels[matched], num_classes)
    cls_w = (assigned >= 0).astype(jnp.float32)
    deltas = bbox2delta(anchors, gt_bboxes[matched],
                        stds=target_stds, legacy=legacy)
    reg_w = is_pos.astype(jnp.float32)[:, None]
    return labels, cls_w, deltas * reg_w, \
        jnp.broadcast_to(reg_w, deltas.shape), is_pos, matched, \
        gt_bboxes[matched]


def ssd_loss(cls_scores, bbox_preds, anchors_flat, gt_bboxes, gt_valid,
             gt_labels, num_classes, train_cfg,
             target_stds=(0.1, 0.1, 0.2, 0.2), pisa_cfg=None,
             legacy=False):
    """Batched MultiBox loss (reference ``ssd_head.py:128-244``).

    ``pisa_cfg=dict(isr=..., carl=...)`` applies ISR-P cls re-weighting
    and the CARL regression term before hard-negative mining (reference
    ``pisa_ssd_head.py:24-139``, configs/pisa/pisa_ssd*)."""
    b = cls_scores[0].shape[0]
    cls_flat = jnp.concatenate(
        [s.reshape(b, -1, num_classes + 1) for s in cls_scores],
        axis=1).astype(jnp.float32)                        # (B, A, C+1)
    reg_flat = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in bbox_preds],
        axis=1).astype(jnp.float32)
    labels, cls_w, bt, bw, is_pos, matched, gtb = jax.vmap(
        lambda gb, gv, gl: ssd_targets(
            anchors_flat, gb, gv, gl, num_classes,
            dict(train_cfg.get("assigner", {})), target_stds,
            legacy))(
        gt_bboxes, gt_valid, gt_labels)

    npos = jnp.sum(is_pos, axis=1).astype(jnp.float32)     # (B,)
    total_pos = jnp.maximum(jnp.sum(npos), 1.0)

    logp = jax.nn.log_softmax(cls_flat, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]

    extra = {}
    if pisa_cfg:
        from ..losses import carl_loss, isr_p
        a_ = cls_flat.shape[1]
        G = gt_bboxes.shape[1]
        pos_f = is_pos.reshape(-1)
        labels_f = labels.reshape(-1)
        matched_f = (matched + jnp.arange(b)[:, None] * G).reshape(-1)
        anc = jnp.broadcast_to(anchors_flat[None],
                               (b,) + anchors_flat.shape).reshape(-1, 4)
        dec = delta2bbox(anc, reg_flat.reshape(-1, 4), (0.,) * 4,
                         tuple(target_stds), legacy=legacy)
        gtb_f = gtb.reshape(-1, 4)
        ix1 = jnp.maximum(dec[:, 0], gtb_f[:, 0])
        iy1 = jnp.maximum(dec[:, 1], gtb_f[:, 1])
        ix2 = jnp.minimum(dec[:, 2], gtb_f[:, 2])
        iy2 = jnp.minimum(dec[:, 3], gtb_f[:, 3])
        inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)

        def _area(v):
            return jnp.clip(v[:, 2] - v[:, 0], 0) * \
                jnp.clip(v[:, 3] - v[:, 1], 0)

        ious = inter / jnp.maximum(_area(dec) + _area(gtb_f) - inter,
                                   1e-6)
        isr = dict(pisa_cfg.get("isr") or {})
        if isr:
            ce_raw = jax.lax.stop_gradient(ce).reshape(-1)
            cls_w = isr_p(cls_w.reshape(-1), ious, pos_f, labels_f,
                          matched_f, jnp.where(pos_f, ce_raw, 0.0),
                          k=isr.get("k", 2.0),
                          bias=isr.get("bias", 0.0)).reshape(b, a_)
        carl = dict(pisa_cfg.get("carl") or {})
        if carl:
            prob = jax.nn.softmax(cls_flat, axis=-1).reshape(
                -1, num_classes + 1)
            pos_prob = jnp.take_along_axis(
                prob, jnp.clip(labels_f, 0, num_classes)[:, None],
                axis=1)[:, 0]
            reg_raw = jnp.abs(reg_flat.reshape(-1, 4)
                              - bt.reshape(-1, 4)) * bw.reshape(-1, 4)
            extra["loss_carl"] = carl.get("loss_weight", 5.0) * carl_loss(
                pos_prob, pos_f, reg_raw, k=carl.get("k", 1.0),
                bias=carl.get("bias", 0.2), avg_factor=total_pos)
    ce = ce * cls_w                                        # (B, A)

    # hard-negative mining, static shapes: rank negatives by loss and
    # keep rank < min(neg_pos_ratio * npos_i, nneg_i) per image
    ratio = float(train_cfg.get("neg_pos_ratio", 3))
    neg_ce = jnp.where(is_pos, -jnp.inf, ce)
    order = jnp.argsort(-neg_ce, axis=1)
    rank = jnp.argsort(order, axis=1).astype(jnp.float32)  # (B, A)
    nneg = jnp.sum((~is_pos) & (cls_w > 0), axis=1).astype(jnp.float32)
    k = jnp.minimum(ratio * npos, nneg)                    # (B,)
    keep_neg = (rank < k[:, None]) & ~is_pos
    loss_cls = jnp.sum(jnp.where(is_pos | keep_neg, ce, 0.0)) / total_pos

    beta = float(train_cfg.get("smoothl1_beta", 1.0))
    loss_bbox = smooth_l1_loss(reg_flat, bt, beta, bw,
                               avg_factor=total_pos)
    return {"loss_cls": loss_cls, "loss_bbox": loss_bbox, **extra}


def ssd_bboxes_single(cls_scores, bbox_preds, anchors_levels, img_shape,
                      num_classes, cfg, target_stds=(0.1, 0.1, 0.2, 0.2),
                      legacy=False):
    """Single-image decode: softmax scores (bg last) -> multiclass NMS
    (reference ``anchor_head.py:get_bboxes`` with ``use_sigmoid=False``)."""
    nms_pre = cfg.get("nms_pre", 1000)
    boxes_all, scores_all = [], []
    for scores, deltas, anchors in zip(cls_scores, bbox_preds,
                                       anchors_levels):
        s = jax.nn.softmax(
            scores.reshape(-1, num_classes + 1).astype(jnp.float32), -1)
        d = deltas.reshape(-1, 4).astype(jnp.float32)
        a = anchors
        if s.shape[0] > nms_pre:
            best = jnp.max(s[:, :num_classes], axis=1)
            _, idx = jax.lax.top_k(best, nms_pre)
            s, d, a = s[idx], d[idx], anchors[idx]
        boxes = clip_boxes(delta2bbox(a, d, means=(0.,) * 4,
                                      stds=target_stds, legacy=legacy),
                           img_shape)
        boxes_all.append(boxes)
        scores_all.append(s)
    boxes = jnp.concatenate(boxes_all, axis=0)
    scores = jnp.concatenate(scores_all, axis=0)           # (N, C+1) bg last
    return multiclass_nms(boxes, scores, cfg.get("score_thr", 0.02),
                          dict(cfg.get("nms", dict(type="nms",
                                                   iou_threshold=0.45))),
                          cfg.get("max_per_img", 200))
