"""FCOS: fully-convolutional one-stage anchor-free head.

reference: ``mmdet/models/dense_heads/fcos_head.py`` (+
``anchor_free_head.py`` for the point grid).  TPU-first notes:

- targets are one batched ``(P, G)`` masked computation over ALL level
  points at once (the reference loops images and expands per level);
  padded GT columns get area=INF so they can never win the min-area
  argmin, which exactly reproduces the empty-GT path.
- the per-level learnable Scale on the reg branch is a flax param;
  ``exp`` keeps distances positive (``norm_on_bbox=False`` config).
- inference is per-level static top-k then one multiclass NMS with
  centerness as the score factor, identical in structure to the RPN/
  Retina paths.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.nms import multiclass_nms
from ..losses import binary_cross_entropy, sigmoid_focal_loss

INF = 1e8


class FCOSHead(nn.Module):
    """Shared cls/reg towers + centerness (reference ``fcos_head.py:
    56-154``); GroupNorm(32) like the reference's ``norm_cfg=GN``."""
    num_classes: int = 1
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5
    centerness_on_reg: bool = False
    # norm_on_bbox (reference fcos_head.py forward_single): reg branch is
    # relu(scale*reg)*stride instead of exp(scale*reg).  The stride
    # multiply happens here (pixel space) for train AND test — the
    # reference defers it at train time and divides the targets instead,
    # which is the same parametrisation of the same IoU objective.
    norm_on_bbox: bool = False
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    # dcn_on_last_conv (reference configs/fcos/*center-normbbox*dcn*):
    # the last tower conv in each branch is a deformable conv
    dcn_on_last_conv: bool = False
    # use_gn=False: the norm-free tower variant (reference
    # fcos_r50_caffe_fpn_4x4_1x_coco.py, norm_cfg=None)
    use_gn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        cls_convs, reg_convs, gn_c, gn_r = [], [], [], []
        for i in range(self.stacked_convs):
            if self.dcn_on_last_conv and i == self.stacked_convs - 1:
                from ...ops.deform_conv import ModulatedDeformConv2d
                cls_convs.append(ModulatedDeformConv2d(
                    self.feat_channels, dtype=self.dtype,
                    name=f"cls_conv{i}"))
                reg_convs.append(ModulatedDeformConv2d(
                    self.feat_channels, dtype=self.dtype,
                    name=f"reg_conv{i}"))
            else:
                cls_convs.append(nn.Conv(self.feat_channels, (3, 3),
                                         padding=[(1, 1), (1, 1)],
                                         dtype=self.dtype,
                                         kernel_init=kaiming,
                                         name=f"cls_conv{i}"))
                reg_convs.append(nn.Conv(self.feat_channels, (3, 3),
                                         padding=[(1, 1), (1, 1)],
                                         dtype=self.dtype,
                                         kernel_init=kaiming,
                                         name=f"reg_conv{i}"))
            if self.use_gn:
                gn_c.append(nn.GroupNorm(num_groups=32, dtype=self.dtype,
                                         name=f"cls_gn{i}"))
                gn_r.append(nn.GroupNorm(num_groups=32, dtype=self.dtype,
                                         name=f"reg_gn{i}"))
            else:
                gn_c.append(lambda v: v)
                gn_r.append(lambda v: v)
        # retina-style focal-bias init on the cls logits
        bias_init = nn.initializers.constant(
            float(-np.log((1 - 0.01) / 0.01)))
        conv_cls = nn.Conv(self.num_classes, (3, 3),
                           padding=[(1, 1), (1, 1)], dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=bias_init, name="conv_cls")
        conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name="conv_reg")
        conv_centerness = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                                  dtype=self.dtype,
                                  kernel_init=nn.initializers.normal(0.01),
                                  name="conv_centerness")
        scales = [self.param(f"scale{i}", nn.initializers.ones, ())
                  for i in range(self.num_levels)]

        cls_out, reg_out, ctr_out = [], [], []
        for lvl, x in enumerate(feats):
            c = r = x
            for i in range(self.stacked_convs):
                c = nn.relu(gn_c[i](cls_convs[i](c)))
                r = nn.relu(gn_r[i](reg_convs[i](r)))
            cls_out.append(conv_cls(c).astype(jnp.float32))
            ctr_feat = r if self.centerness_on_reg else c
            ctr_out.append(conv_centerness(ctr_feat).astype(jnp.float32))
            reg = conv_reg(r).astype(jnp.float32) * scales[lvl]
            if self.norm_on_bbox:
                reg_out.append(nn.relu(reg) * float(self.strides[lvl]))
            else:
                reg_out.append(jnp.exp(reg))
        return cls_out, reg_out, ctr_out


def fcos_points(featmap_sizes, strides):
    """Per-level point grids ``(H*W, 2)`` at cell centers (reference
    ``anchor_free_head.py`` ``_get_points_single``: ``x*stride +
    stride//2``)."""
    out = []
    for (h, w), s in zip(featmap_sizes, strides):
        xs = (np.arange(w, dtype=np.float32)) * s + s // 2
        ys = (np.arange(h, dtype=np.float32)) * s + s // 2
        gx, gy = np.meshgrid(xs, ys)
        out.append(np.stack([gx.ravel(), gy.ravel()], -1))
    return out


def fcos_targets(points, regress_ranges, gt_bboxes, gt_valid, gt_labels,
                 num_classes, strides_pt=None, center_sample_radius=0.0):
    """Single-image FCOS targets over the flat point set (vmap over batch).

    reference ``fcos_head.py:459-545`` ``_get_target_single``: a point is
    positive for the smallest-area gt that contains it whose max
    regression distance falls in the point's level range.  With
    ``center_sample_radius > 0`` (+ per-point ``strides_pt``) the
    positive region shrinks to the gt box intersected with a
    ``radius * stride`` box around the gt center (reference
    center_sampling branch).

    Args:
      points: ``(P, 2)``; regress_ranges: ``(P, 2)`` per-point level range.
      gt_bboxes ``(G, 4)``, gt_valid ``(G,)``, gt_labels ``(G,)``.
    Returns labels ``(P,)`` (bg == num_classes), bbox_targets ``(P, 4)``
    (l, t, r, b) and centerness targets ``(P,)``.
    """
    xs = points[:, 0][:, None]
    ys = points[:, 1][:, None]
    left = xs - gt_bboxes[None, :, 0]
    top = ys - gt_bboxes[None, :, 1]
    right = gt_bboxes[None, :, 2] - xs
    bottom = gt_bboxes[None, :, 3] - ys
    ltrb = jnp.stack([left, top, right, bottom], -1)      # (P, G, 4)

    if center_sample_radius > 0.0 and strides_pt is not None:
        cx = (gt_bboxes[None, :, 0] + gt_bboxes[None, :, 2]) * 0.5
        cy = (gt_bboxes[None, :, 1] + gt_bboxes[None, :, 3]) * 0.5
        r = strides_pt[:, None] * center_sample_radius
        # center box clipped to the gt box (reference fcos_head.py
        # center_sampling: x_mins = max(center - radius, gt_x1) etc.)
        x1 = jnp.maximum(cx - r, gt_bboxes[None, :, 0])
        y1 = jnp.maximum(cy - r, gt_bboxes[None, :, 1])
        x2 = jnp.minimum(cx + r, gt_bboxes[None, :, 2])
        y2 = jnp.minimum(cy + r, gt_bboxes[None, :, 3])
        inside = ((xs > x1) & (xs < x2) & (ys > y1) & (ys < y2)
                  & (jnp.min(ltrb, -1) > 0))
    else:
        inside = jnp.min(ltrb, -1) > 0
    max_dist = jnp.max(ltrb, -1)
    in_range = (max_dist >= regress_ranges[:, None, 0]) & \
        (max_dist <= regress_ranges[:, None, 1])
    areas = ((gt_bboxes[:, 2] - gt_bboxes[:, 0])
             * (gt_bboxes[:, 3] - gt_bboxes[:, 1]))[None, :]
    areas = jnp.where(inside & in_range & gt_valid[None, :], areas, INF)
    min_area = jnp.min(areas, axis=1)
    min_idx = jnp.argmin(areas, axis=1)

    labels = jnp.where(min_area < INF, gt_labels[min_idx], num_classes)
    p = points.shape[0]
    tgt = ltrb[jnp.arange(p), min_idx]                    # (P, 4)
    lr = jnp.stack([tgt[:, 0], tgt[:, 2]], -1)
    tb = jnp.stack([tgt[:, 1], tgt[:, 3]], -1)
    ctr = jnp.sqrt(jnp.clip(
        (jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), 1e-6))
        * (jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), 1e-6)), 0.0))
    return labels.astype(jnp.int32), tgt, ctr


def _decode_ltrb(points, dists):
    return jnp.stack([points[..., 0] - dists[..., 0],
                      points[..., 1] - dists[..., 1],
                      points[..., 0] + dists[..., 2],
                      points[..., 1] + dists[..., 3]], -1)


def fcos_loss(cls_scores, bbox_preds, centernesses, points_flat,
              ranges_flat, gt_bboxes, gt_valid, gt_labels, num_classes,
              gamma=2.0, alpha=0.25, strides_flat=None,
              center_sample_radius=0.0, bbox_loss_mode="iou"):
    """Batched FCOS loss (reference ``fcos_head.py:156-252``): focal cls
    averaged by num_pos; IoU (or GIoU, reference *giou* configs) loss on
    decoded boxes weighted by the centerness target and averaged by its
    sum; BCE centerness."""
    b = cls_scores[0].shape[0]
    cls_flat = jnp.concatenate(
        [c.reshape(b, -1, num_classes) for c in cls_scores], 1)
    reg_flat = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in bbox_preds], 1)
    ctr_flat = jnp.concatenate(
        [c.reshape(b, -1) for c in centernesses], 1)

    labels, tgt, ctr_t = jax.vmap(
        lambda gb, gv, gl: fcos_targets(points_flat, ranges_flat, gb, gv,
                                        gl, num_classes,
                                        strides_pt=strides_flat,
                                        center_sample_radius=(
                                            center_sample_radius))
    )(gt_bboxes, gt_valid, gt_labels)

    pos = labels < num_classes                            # (B, P)
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    loss_cls = sigmoid_focal_loss(cls_flat, onehot, gamma, alpha,
                                  avg_factor=num_pos)

    pts = jnp.broadcast_to(points_flat[None], (b,) + points_flat.shape)
    dec_pred = _decode_ltrb(pts, reg_flat)
    dec_tgt = _decode_ltrb(pts, tgt)
    ix1 = jnp.maximum(dec_pred[..., 0], dec_tgt[..., 0])
    iy1 = jnp.maximum(dec_pred[..., 1], dec_tgt[..., 1])
    ix2 = jnp.minimum(dec_pred[..., 2], dec_tgt[..., 2])
    iy2 = jnp.minimum(dec_pred[..., 3], dec_tgt[..., 3])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    area_p = jnp.clip(dec_pred[..., 2] - dec_pred[..., 0], 0) * \
        jnp.clip(dec_pred[..., 3] - dec_pred[..., 1], 0)
    area_t = jnp.clip(dec_tgt[..., 2] - dec_tgt[..., 0], 0) * \
        jnp.clip(dec_tgt[..., 3] - dec_tgt[..., 1], 0)
    union = jnp.maximum(area_p + area_t - inter, 1e-6)
    iou = inter / union
    w = ctr_t * pos
    if bbox_loss_mode == "giou":
        ex1 = jnp.minimum(dec_pred[..., 0], dec_tgt[..., 0])
        ey1 = jnp.minimum(dec_pred[..., 1], dec_tgt[..., 1])
        ex2 = jnp.maximum(dec_pred[..., 2], dec_tgt[..., 2])
        ey2 = jnp.maximum(dec_pred[..., 3], dec_tgt[..., 3])
        enclose = jnp.maximum((ex2 - ex1) * (ey2 - ey1), 1e-6)
        giou = iou - (enclose - union) / enclose
        per_pt = 1.0 - giou
    else:
        per_pt = -jnp.log(jnp.clip(iou, 1e-6))
    loss_bbox = jnp.sum(per_pt * w) / jnp.maximum(jnp.sum(w), 1e-6)

    loss_ctr = binary_cross_entropy(ctr_flat, ctr_t,
                                    pos.astype(jnp.float32),
                                    avg_factor=num_pos)
    return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
            "loss_centerness": loss_ctr}


def fcos_bboxes_single(cls_scores, bbox_preds, centernesses, points_levels,
                       img_shape, num_classes, cfg):
    """Single-image FCOS inference (vmap over batch): per-level top-k by
    score, decode, multiclass NMS with centerness score factors
    (reference ``fcos_head.py:310-385``)."""
    nms_pre = int(cfg.get("nms_pre", 1000))
    boxes_all, scores_all, ctr_all = [], [], []
    for cs, bp, cn, pts in zip(cls_scores, bbox_preds, centernesses,
                               points_levels):
        c = cs.reshape(-1, num_classes)
        r = bp.reshape(-1, 4)
        n = jax.nn.sigmoid(cn.reshape(-1))
        s = jax.nn.sigmoid(c)
        k = min(nms_pre, s.shape[0])
        rank = jnp.max(s, -1) * n
        _, idx = jax.lax.top_k(rank, k)
        boxes = _decode_ltrb(pts[idx], r[idx])
        boxes = jnp.stack([
            jnp.clip(boxes[:, 0], 0, img_shape[1]),
            jnp.clip(boxes[:, 1], 0, img_shape[0]),
            jnp.clip(boxes[:, 2], 0, img_shape[1]),
            jnp.clip(boxes[:, 3], 0, img_shape[0])], -1)
        boxes_all.append(boxes)
        scores_all.append(s[idx])
        ctr_all.append(n[idx])
    boxes = jnp.concatenate(boxes_all, 0)
    scores = jnp.concatenate(scores_all, 0) \
        * jnp.concatenate(ctr_all, 0)[:, None]
    # multiclass_nms expects (N, C+1) with background last
    scores = jnp.concatenate(
        [scores, jnp.zeros((scores.shape[0], 1))], -1)
    return multiclass_nms(boxes, scores, cfg.get("score_thr", 0.05),
                          dict(cfg.get("nms", dict(type="nms",
                                                   iou_threshold=0.5))),
                          cfg.get("max_per_img", 100))
