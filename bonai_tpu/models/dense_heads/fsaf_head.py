"""FSAF: feature-selective anchor-free head.

reference: ``mmdet/models/dense_heads/fsaf_head.py`` +
``mmdet/core/bbox/assigners/center_region_assigner.py`` +
``mmdet/core/bbox/coder/tblr_bbox_coder.py`` (arXiv 1903.00621).

Semantics: each cell inside a gt's shrunken center region (pos_scale
0.2) is positive for that gt (smallest-area gt wins contested cells);
regression is the TBLR distance set normalised by ``stride * 4``; the
ONLINE feature selection assigns every gt to the pyramid level where
its current average (focal + IoU) loss is smallest, and only that
level keeps the gt's positives.

TPU formulation: per-level ``(G, H, W)`` region masks with min-area
ownership resolved by a masked argmin — no per-gt python loops; the
level-selection pass reuses the same masks with detached losses.
Single-class note: the reference's 'shadowed label' suppression zeroes
only the overlapped class's loss at contested cells; with overlapping
regions resolved to the min-area owner this matters only for
multi-class overlaps of different classes, which the ownership argmin
approximates (the BONAI trunk is single-class where both coincide).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.nms import multiclass_nms
from ..losses import sigmoid_focal_loss

BIG = 1e8


class FSAFHead(nn.Module):
    """Retina-style towers, one anchor-free prediction per cell; the
    reg branch is ReLU'd (TBLR distances are non-negative)."""
    num_classes: int = 1
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        cls_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1), (1, 1)], dtype=self.dtype,
                             kernel_init=kaiming, name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1), (1, 1)], dtype=self.dtype,
                             kernel_init=kaiming, name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        bias_init = nn.initializers.constant(
            float(-np.log((1 - 0.01) / 0.01)))
        conv_cls = nn.Conv(self.num_classes, (3, 3),
                           padding=[(1, 1), (1, 1)], dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=bias_init, name="retina_cls")
        conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name="retina_reg")
        cls_out, reg_out = [], []
        for x in feats:
            c = r = x
            for i in range(self.stacked_convs):
                c = nn.relu(cls_convs[i](c))
                r = nn.relu(reg_convs[i](r))
            cls_out.append(conv_cls(c).astype(jnp.float32))
            reg_out.append(nn.relu(conv_reg(r)).astype(jnp.float32))
        return cls_out, reg_out


def _center_region(boxes, scale):
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    w = (boxes[..., 2] - boxes[..., 0]) * scale * 0.5
    h = (boxes[..., 3] - boxes[..., 1]) * scale * 0.5
    return jnp.stack([cx - w, cy - h, cx + w, cy + h], -1)


def fsaf_level_masks(gt_bboxes, gt_valid, h, w, stride, pos_scale=0.2):
    """Per-gt positive-region membership and min-area cell ownership on
    one level.  Returns ``in_pos (G, H, W)`` and ``owner (H, W)`` int32
    (-1 = background)."""
    region = _center_region(gt_bboxes, pos_scale) / stride
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    inx = (xs[None, :] >= region[:, 0, None]) & \
        (xs[None, :] <= region[:, 2, None])
    iny = (ys[None, :] >= region[:, 1, None]) & \
        (ys[None, :] <= region[:, 3, None])
    in_pos = iny[:, :, None] & inx[:, None, :] & \
        gt_valid[:, None, None]                           # (G, H, W)
    area = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) * \
        (gt_bboxes[:, 3] - gt_bboxes[:, 1])
    key = jnp.where(in_pos, area[:, None, None], BIG)
    owner = jnp.argmin(key, axis=0).astype(jnp.int32)
    owner = jnp.where(jnp.min(key, axis=0) < BIG, owner, -1)
    return in_pos, owner


def fsaf_tblr_targets(gt_bboxes, h, w, stride, normalizer=4.0):
    """(G, H, W, 4) TBLR distances of every cell center to every gt,
    normalised by ``stride * normalizer`` (reference TBLRBBoxCoder)."""
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
    t = ys[None, :, None] - gt_bboxes[:, 1, None, None]
    b = gt_bboxes[:, 3, None, None] - ys[None, :, None]
    l_ = xs[None, None, :] - gt_bboxes[:, 0, None, None]
    r = gt_bboxes[:, 2, None, None] - xs[None, None, :]
    t = jnp.broadcast_to(t, (gt_bboxes.shape[0], h, w))
    b = jnp.broadcast_to(b, t.shape)
    l_ = jnp.broadcast_to(l_, t.shape)
    r = jnp.broadcast_to(r, t.shape)
    return jnp.stack([t, b, l_, r], -1) / (stride * normalizer)


def decode_tblr(pred, h, w, stride, normalizer=4.0):
    """(H, W, 4) TBLR prediction -> (H*W, 4) xyxy boxes."""
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
    d = pred * (stride * normalizer)
    x1 = xs[None, :] - d[..., 2]
    x2 = xs[None, :] + d[..., 3]
    y1 = ys[:, None] - d[..., 0]
    y2 = ys[:, None] + d[..., 1]
    return jnp.stack([x1, y1, x2, y2], -1).reshape(-1, 4)


def _iou_loss_cells(pred_tblr, tgt_tblr):
    """Linear IoU loss between decoded TBLR sets (elementwise cells)."""
    def area(d):
        return jnp.maximum(d[..., 0] + d[..., 1], 0) * \
            jnp.maximum(d[..., 2] + d[..., 3], 0)
    it = jnp.minimum(pred_tblr[..., 0], tgt_tblr[..., 0])
    ib = jnp.minimum(pred_tblr[..., 1], tgt_tblr[..., 1])
    il = jnp.minimum(pred_tblr[..., 2], tgt_tblr[..., 2])
    ir = jnp.minimum(pred_tblr[..., 3], tgt_tblr[..., 3])
    inter = jnp.maximum(it + ib, 0) * jnp.maximum(il + ir, 0)
    union = jnp.maximum(area(pred_tblr) + area(tgt_tblr) - inter, 1e-6)
    return 1.0 - inter / union


def fsaf_loss(cls_scores, reg_preds, gt_bboxes, gt_valid, gt_labels,
              num_classes, strides, pos_scale=0.2, normalizer=4.0,
              gamma=2.0, alpha=0.25):
    """Batched FSAF loss with online level selection (reference
    ``fsaf_head.py`` ``loss`` + ``collect_loss_level_single``)."""
    b = cls_scores[0].shape[0]
    g = gt_bboxes.shape[1]
    num_lvls = len(strides)

    # pass 1: per-(gt, level) average loss for the ONLINE selection
    # (detached, like the reference's no-grad selection)
    lvl_loss = []
    per_level = []       # cache masks/targets for pass 2
    for li, (cs, rp, s) in enumerate(zip(cls_scores, reg_preds, strides)):
        h, w = cs.shape[1], cs.shape[2]

        def one_img(gb, gv, gl, c, r):
            in_pos, owner = fsaf_level_masks(gb, gv, h, w, s, pos_scale)
            tblr = fsaf_tblr_targets(gb, h, w, s, normalizer)
            onehot = jax.nn.one_hot(gl, num_classes)      # (G, nc)
            focal = sigmoid_focal_loss(
                c[None], jnp.broadcast_to(onehot[:, None, None, :],
                                          (g, h, w, num_classes)),
                gamma, alpha, reduction="none")           # (G, H, W, nc)
            iou = _iou_loss_cells(r[None], tblr)          # (G, H, W)
            per_gt = (jnp.sum(jnp.where(in_pos[..., None], focal, 0.0),
                              axis=(1, 2, 3))
                      + jnp.sum(jnp.where(in_pos, iou, 0.0), axis=(1, 2)))
            n_cells = jnp.maximum(jnp.sum(in_pos, axis=(1, 2)), 1.0)
            return per_gt / n_cells, in_pos, owner, tblr

        pg, in_pos, owner, tblr = jax.vmap(one_img)(
            gt_bboxes, gt_valid,
            gt_labels, cs, rp)
        lvl_loss.append(jax.lax.stop_gradient(pg))        # (B, G)
        per_level.append((in_pos, owner, tblr))
    sel = jnp.argmin(jnp.stack(lvl_loss, 0), axis=0)      # (B, G)

    # pass 2: losses with each gt active only on its selected level
    total_cls = 0.0
    total_reg = 0.0
    num_pos = 0.0
    for li, (cs, rp, s) in enumerate(zip(cls_scores, reg_preds, strides)):
        in_pos, owner, tblr = per_level[li]
        active = in_pos & (sel == li)[:, :, None, None]   # (B, G, H, W)
        own1h = jax.nn.one_hot(owner, g, dtype=jnp.bool_)  # (B,H,W,G)
        active_cell = jnp.any(active & own1h.transpose(0, 3, 1, 2),
                              axis=1)                     # (B, H, W)
        own_c = jnp.clip(owner, 0, g - 1)
        bidx = jnp.arange(b)[:, None, None]
        lab = gt_labels[bidx, own_c]                      # (B, H, W)
        onehot = jax.nn.one_hot(lab, num_classes) \
            * active_cell[..., None]
        focal = sigmoid_focal_loss(cs, onehot, gamma, alpha,
                                   reduction="none")
        total_cls = total_cls + jnp.sum(focal)
        tgt = jnp.take_along_axis(
            tblr, own_c[:, None, :, :, None], axis=1)[:, 0]  # (B,H,W,4)
        iou = _iou_loss_cells(rp, tgt)
        total_reg = total_reg + jnp.sum(
            jnp.where(active_cell, iou, 0.0))
        num_pos = num_pos + jnp.sum(active_cell)
    denom = jnp.maximum(num_pos, 1.0)
    return {"loss_cls": total_cls / denom,
            "loss_bbox": total_reg / denom}


def fsaf_bboxes_single(cls_scores, reg_preds, img_shape, num_classes,
                       strides, cfg, normalizer=4.0):
    """Single-image FSAF inference (vmap over batch)."""
    nms_pre = int(cfg.get("nms_pre", 1000))
    boxes_all, scores_all = [], []
    for cs, rp, s in zip(cls_scores, reg_preds, strides):
        h, w = cs.shape[0], cs.shape[1]
        sc = jax.nn.sigmoid(cs.reshape(-1, num_classes))
        boxes = decode_tblr(rp, h, w, s, normalizer)
        boxes = jnp.stack([
            jnp.clip(boxes[:, 0], 0, img_shape[1]),
            jnp.clip(boxes[:, 1], 0, img_shape[0]),
            jnp.clip(boxes[:, 2], 0, img_shape[1]),
            jnp.clip(boxes[:, 3], 0, img_shape[0])], -1)
        k = min(nms_pre, sc.shape[0])
        _, idx = jax.lax.top_k(jnp.max(sc, -1), k)
        boxes_all.append(boxes[idx])
        scores_all.append(sc[idx])
    boxes = jnp.concatenate(boxes_all, 0)
    scores = jnp.concatenate(scores_all, 0)
    scores = jnp.concatenate([scores,
                              jnp.zeros((scores.shape[0], 1))], -1)
    return multiclass_nms(boxes, scores, cfg.get("score_thr", 0.05),
                          dict(cfg.get("nms", dict(type="nms",
                                                   iou_threshold=0.5))),
                          cfg.get("max_per_img", 100))
