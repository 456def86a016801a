"""RPN head: module, target assignment, loss, proposal generation.

reference: ``mmdet/models/dense_heads/rpn_head.py:13-168`` and
``anchor_head.py:150-652``.  The reference's per-image python loops over
ragged GT (``_get_targets_single``) become batched masked ops; the
per-level ``batched_nms`` becomes per-level hard NMS + global top-k, which
is mathematically identical (level offsets prevent cross-level
suppression).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.assigners import max_iou_assign
from ...core.boxes import bbox2delta, delta2bbox, clip_boxes
from ...core.nms import nms, NEG_INF
from ...core.samplers import random_sample
from ..losses import binary_cross_entropy, l1_loss


class RPNHead(nn.Module):
    """3x3 conv + relu, then 1x1 cls (A) and 1x1 reg (A*4) convs.

    reference: ``rpn_head.py:24-44`` (init: normal std 0.01).
    """
    in_channels: int = 256
    feat_channels: int = 256
    num_anchors: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        init = nn.initializers.normal(0.01)
        cls_scores, bbox_preds = [], []
        conv = nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype, kernel_init=init, name="rpn_conv")
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      kernel_init=init, name="rpn_cls")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                      kernel_init=init, name="rpn_reg")
        for x in feats:
            t = nn.relu(conv(x))
            cls_scores.append(cls(t))
            bbox_preds.append(reg(t))
        return cls_scores, bbox_preds


def rpn_targets(rng, anchors, gt_bboxes, gt_valid, assigner_cfg,
                sampler_cfg, legacy=False):
    """Single-image RPN targets over flattened anchors (vmap over batch).

    Returns (labels, label_weights, bbox_targets, bbox_weights, num_samples)
    where labels are binary fg targets (sigmoid head).
    """
    assigned, _ = max_iou_assign(
        anchors, gt_bboxes, gt_valid,
        pos_iou_thr=assigner_cfg.get("pos_iou_thr", 0.7),
        neg_iou_thr=assigner_cfg.get("neg_iou_thr", 0.3),
        min_pos_iou=assigner_cfg.get("min_pos_iou", 0.3),
        match_low_quality=assigner_cfg.get("match_low_quality", True))
    res = random_sample(rng, assigned,
                        num=sampler_cfg.get("num", 256),
                        pos_fraction=sampler_cfg.get("pos_fraction", 0.5),
                        neg_pos_ub=sampler_cfg.get("neg_pos_ub", -1))
    n = anchors.shape[0]
    labels = jnp.zeros(n, jnp.float32)
    label_weights = jnp.zeros(n, jnp.float32)
    pos_slot = res["is_pos"]
    valid_slot = res["valid"]
    labels = labels.at[res["inds"]].add(
        jnp.where(pos_slot, 1.0, 0.0))
    label_weights = label_weights.at[res["inds"]].add(
        jnp.where(valid_slot, 1.0, 0.0))
    # each candidate index is sampled at most once, so .add == .set here
    matched_gt = gt_bboxes[res["pos_gt_inds"]]              # (num, 4)
    sampled_anchors = anchors[res["inds"]]
    deltas = bbox2delta(sampled_anchors, matched_gt,
                        legacy=legacy)
    bbox_targets = jnp.zeros((n, 4), jnp.float32)
    bbox_weights = jnp.zeros((n, 4), jnp.float32)
    w = jnp.where(pos_slot, 1.0, 0.0)[:, None]
    bbox_targets = bbox_targets.at[res["inds"]].add(deltas * w)
    bbox_weights = bbox_weights.at[res["inds"]].add(
        jnp.broadcast_to(w, (w.shape[0], 4)))
    num_samples = jnp.sum(jnp.where(valid_slot, 1.0, 0.0))
    return labels, label_weights, bbox_targets, bbox_weights, num_samples


def rpn_loss(cls_scores, bbox_preds, anchors_flat, gt_bboxes, gt_valid,
             rng, train_cfg, reg_weight=None):
    """Batched RPN loss.

    Args:
      cls_scores / bbox_preds: per-level ``(B, H, W, A)`` / ``(B, H, W, A*4)``.
      anchors_flat: ``(A_total, 4)`` concatenated level anchors (host const).
      gt_bboxes: ``(B, G, 4)``; gt_valid ``(B, G)``.
      reg_weight: optional ``(B,)`` per-image regression weight
        (SemiRPNHead zeroes reg for footprint-only images,
        reference ``semi_rpn_head.py:146``).

    reference loss normalisation (``anchor_head.py:382-428``): both cls and
    reg averaged by total sampled anchors.
    """
    b = cls_scores[0].shape[0]
    cls_flat = jnp.concatenate(
        [s.reshape(b, -1) for s in cls_scores], axis=1).astype(jnp.float32)
    reg_flat = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in bbox_preds], axis=1).astype(jnp.float32)

    rngs = jax.random.split(rng, b)
    labels, lw, bt, bw, ns = jax.vmap(
        lambda r, gtb, gtv: rpn_targets(
            r, anchors_flat, gtb, gtv, train_cfg["assigner"],
            train_cfg["sampler"],
            legacy=train_cfg.get("legacy_coder", False))
    )(rngs, gt_bboxes, gt_valid)

    num_total = jnp.maximum(jnp.sum(ns), 1.0)
    loss_cls = binary_cross_entropy(cls_flat, labels, lw,
                                    avg_factor=num_total)
    if reg_weight is not None:
        bw = bw * reg_weight[:, None, None]
    loss_bbox = l1_loss(reg_flat, bt, bw, avg_factor=num_total)
    return {"loss_rpn_cls": loss_cls, "loss_rpn_bbox": loss_bbox}


def rpn_proposals_single(cls_scores, bbox_preds, anchors_levels, img_shape,
                         cfg):
    """Single-image proposal generation (vmap over batch).

    Args:
      cls_scores: per-level ``(H, W, A)`` logits.
      bbox_preds: per-level ``(H, W, A*4)``.
      anchors_levels: per-level ``(H*W*A, 4)`` host constants.
      img_shape: ``(2,)`` (h, w) of the resized (pre-pad) image.
      cfg: dict with nms_pre / nms_post / max_num / nms_thr / min_bbox_size.

    reference: ``rpn_head.py:79-168`` — per-level top-nms_pre by sigmoid
    score, decode, clip, (min size filter), level-offset batched NMS, top
    max_num.  Returns fixed ``(max_num, 4)`` boxes, scores, valid mask.
    """
    nms_pre = cfg.get("nms_pre", 1000)
    max_num = cfg.get("max_num", cfg.get("nms_post", 1000))
    nms_thr = cfg.get("nms_thr", 0.7)
    min_bbox_size = cfg.get("min_bbox_size", 0)

    level_boxes, level_scores = [], []
    for scores, deltas, anchors in zip(cls_scores, bbox_preds,
                                       anchors_levels):
        s = jax.nn.sigmoid(scores.reshape(-1).astype(jnp.float32))
        d = deltas.reshape(-1, 4).astype(jnp.float32)
        n = s.shape[0]
        if n > nms_pre:
            s, idx = jax.lax.top_k(s, nms_pre)
            d = d[idx]
            a = anchors[idx]
        else:
            a = anchors
        boxes = delta2bbox(
            a, d, legacy=cfg.get("legacy_coder", False))
        boxes = clip_boxes(boxes, img_shape)
        valid = jnp.ones_like(s, bool)
        if min_bbox_size > 0:
            w = boxes[:, 2] - boxes[:, 0]
            h = boxes[:, 3] - boxes[:, 1]
            valid = (w > min_bbox_size) & (h > min_bbox_size)
        keep = nms(boxes, s, nms_thr, valid=valid)
        level_boxes.append(boxes)
        level_scores.append(jnp.where(keep, s, 0.0))

    all_boxes = jnp.concatenate(level_boxes, axis=0)
    all_scores = jnp.concatenate(level_scores, axis=0)
    k = min(max_num, all_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(all_scores, k)
    top_boxes = all_boxes[top_idx]
    if k < max_num:
        top_boxes = jnp.pad(top_boxes, ((0, max_num - k), (0, 0)))
        top_scores = jnp.pad(top_scores, (0, max_num - k))
    return top_boxes, top_scores, top_scores > 0
