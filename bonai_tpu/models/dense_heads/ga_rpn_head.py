"""Guided Anchoring RPN (GA-RPN).

reference: ``mmdet/models/dense_heads/guided_anchor_head.py`` +
``ga_rpn_head.py`` (arXiv 1901.03278).  Each cell predicts an
objectness *location* score and an anchor *shape* (dw, dh) decoded onto
a per-cell square; features are adapted with a deformable conv driven
by the shape prediction; the cls/reg branches then run on the adapted
features with the guided anchors.

TPU-first notes:
- loc targets (center/ignore region painting, reference
  ``ga_loc_targets``) become vectorised region-membership masks over the
  padded GT set — no per-gt python loops over images.
- the approx-max-IoU assignment (best of 9 approxes per square,
  reference ``ApproxMaxIoUAssigner``) is one ``(cells*9, G)`` IoU matrix
  max-reduced over the octave axis, fed to the standard masked assigner
  through its ``overlaps`` hook.
- the reference's MaskedConv inference speed-up is realised by masking
  the objectness scores with the loc filter before top-k (same
  selection, no sparse bookkeeping).
- feature adaption uses our gather-formulation deformable conv with a
  single offset group (the reference uses deform_groups=4; a shared
  offset field changes capacity, not semantics).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.assigners import max_iou_assign
from ...core.boxes import bbox_overlaps, delta2bbox
from ...core.nms import batched_nms
from ...core.samplers import random_sample
from ...ops.deform_conv import deform_conv2d
from ..losses import (binary_cross_entropy, bounded_iou_loss, l1_loss,
                      sigmoid_focal_loss)
from .rpn_head import rpn_targets


class GARPNHead(nn.Module):
    """Head module: rpn conv + loc/shape branches + shape-driven feature
    adaption + cls/reg on adapted features."""
    in_channels: int = 256
    feat_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        init = nn.initializers.normal(0.01)
        loc_bias = nn.initializers.constant(
            float(-np.log((1 - 0.01) / 0.01)))
        outs = []
        rpn_conv = nn.Conv(self.feat_channels, (3, 3),
                           padding=[(1, 1), (1, 1)], dtype=self.dtype,
                           kernel_init=init, name="rpn_conv")
        conv_loc = nn.Conv(1, (1, 1), dtype=self.dtype, kernel_init=init,
                           bias_init=loc_bias, name="conv_loc")
        conv_shape = nn.Conv(2, (1, 1), dtype=self.dtype, kernel_init=init,
                             name="conv_shape")
        conv_offset = nn.Conv(18, (1, 1), use_bias=False, dtype=self.dtype,
                              kernel_init=nn.initializers.zeros,
                              name="conv_offset")
        adapt_kernel = self.param(
            "adaption_kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (3, 3, self.feat_channels, self.feat_channels), jnp.float32)
        conv_cls = nn.Conv(1, (1, 1), dtype=self.dtype, kernel_init=init,
                           name="conv_cls")
        conv_reg = nn.Conv(4, (1, 1), dtype=self.dtype, kernel_init=init,
                           name="conv_reg")
        for x in feats:
            x = nn.relu(rpn_conv(x.astype(self.dtype)))
            loc = conv_loc(x).astype(jnp.float32)
            shape = conv_shape(x).astype(jnp.float32)
            # feature adaption: offsets from the (detached) shape pred
            off = conv_offset(jax.lax.stop_gradient(shape)
                              .astype(self.dtype))
            x = nn.relu(deform_conv2d(x, off.astype(jnp.float32),
                                      adapt_kernel.astype(self.dtype)))
            outs.append((conv_cls(x).astype(jnp.float32),
                         conv_reg(x).astype(jnp.float32), shape, loc))
        return tuple(zip(*outs))      # (cls, reg, shape, loc) per-level


def square_anchors(featmap_sizes, strides, octave_base_scale):
    """Per-cell square anchors (reference ``square_anchor_generator``:
    one ratio-1 anchor of ``octave_base_scale * stride`` per cell)."""
    out = []
    for (h, w), s in zip(featmap_sizes, strides):
        half = octave_base_scale * s / 2.0
        xs = (np.arange(w, dtype=np.float32) + 0.5) * s
        ys = (np.arange(h, dtype=np.float32) + 0.5) * s
        gx, gy = np.meshgrid(xs, ys)
        out.append(np.stack([gx.ravel() - half, gy.ravel() - half,
                             gx.ravel() + half, gy.ravel() + half], -1))
    return out


def approx_anchors(featmap_sizes, strides, octave_base_scale,
                   scales_per_octave=3, ratios=(0.5, 1.0, 2.0)):
    """9 approx anchors per cell (reference ``approx_anchor_generator``),
    octave-major per cell so an over-octave reshape recovers them."""
    scales = [octave_base_scale * 2 ** (i / scales_per_octave)
              for i in range(scales_per_octave)]
    out = []
    for (h, w), s in zip(featmap_sizes, strides):
        xs = (np.arange(w, dtype=np.float32) + 0.5) * s
        ys = (np.arange(h, dtype=np.float32) + 0.5) * s
        gx, gy = np.meshgrid(xs, ys)
        cx, cy = gx.ravel(), gy.ravel()
        per_cell = []
        for sc in scales:
            for r in ratios:
                aw = sc * s * np.sqrt(1.0 / r)
                ah = sc * s * np.sqrt(r)
                per_cell.append((aw, ah))
        boxes = []
        for aw, ah in per_cell:
            boxes.append(np.stack([cx - aw / 2, cy - ah / 2,
                                   cx + aw / 2, cy + ah / 2], -1))
        # (cells, 9, 4)
        out.append(np.stack(boxes, 1))
    return out


def decode_guided_anchors(squares, shape_pred, stds=(1.0, 1.0)):
    """Guided anchor = square with w, h scaled by exp(shape) (reference
    ``_get_guided_anchors_single`` via the [0,0,dw,dh] delta decode)."""
    cx = (squares[:, 0] + squares[:, 2]) * 0.5
    cy = (squares[:, 1] + squares[:, 3]) * 0.5
    w = squares[:, 2] - squares[:, 0]
    h = squares[:, 3] - squares[:, 1]
    dw = jnp.clip(shape_pred[:, 0] * stds[0], -6.0, 6.0)
    dh = jnp.clip(shape_pred[:, 1] * stds[1], -6.0, 6.0)
    nw = w * jnp.exp(dw)
    nh = h * jnp.exp(dh)
    return jnp.stack([cx - nw / 2, cy - nh / 2,
                      cx + nw / 2, cy + nh / 2], -1)


def _region_bounds(boxes, ratio, h, w):
    """calc_region (reference ``core/anchor/utils.py:77-97``): centred
    sub-box of ``ratio`` side fraction, clipped to the map."""
    x1 = jnp.round((1 - ratio) * 0.5 * (boxes[:, 0] + boxes[:, 2])
                   + ratio * boxes[:, 0])
    y1 = jnp.round((1 - ratio) * 0.5 * (boxes[:, 1] + boxes[:, 3])
                   + ratio * boxes[:, 1])
    x2 = jnp.round((1 - ratio) * 0.5 * (boxes[:, 0] + boxes[:, 2])
                   + ratio * boxes[:, 2])
    y2 = jnp.round((1 - ratio) * 0.5 * (boxes[:, 1] + boxes[:, 3])
                   + ratio * boxes[:, 3])
    return (jnp.clip(x1, 0, w - 1), jnp.clip(y1, 0, h - 1),
            jnp.clip(x2, 0, w - 1), jnp.clip(y2, 0, h - 1))


def _paint(boxes, sel, h, w, ratio):
    """OR of centred regions of the selected boxes on an (h, w) grid."""
    x1, y1, x2, y2 = _region_bounds(boxes, ratio, h, w)
    xx = jnp.arange(w, dtype=jnp.float32)
    yy = jnp.arange(h, dtype=jnp.float32)
    inx = (xx[None, :] >= x1[:, None]) & (xx[None, :] <= x2[:, None])
    iny = (yy[None, :] >= y1[:, None]) & (yy[None, :] <= y2[:, None])
    m = iny[:, :, None] & inx[:, None, :] & sel[:, None, None]
    return jnp.any(m, axis=0)                             # (h, w)


def ga_loc_targets(gt_bboxes, gt_valid, featmap_sizes, strides,
                   octave_base_scale, center_ratio=0.2, ignore_ratio=0.5):
    """Batched location targets (reference ``ga_loc_targets``): per gt a
    single feature level gets a positive center region; ignore rings on
    that level and its neighbours get weight 0; the rest weight 0.1."""
    b, g = gt_bboxes.shape[:2]
    num_lvls = len(featmap_sizes)
    r1 = (1 - center_ratio) / 2
    r2 = (1 - ignore_ratio) / 2
    scale = jnp.sqrt(jnp.maximum(
        (gt_bboxes[..., 2] - gt_bboxes[..., 0])
        * (gt_bboxes[..., 3] - gt_bboxes[..., 1]), 1e-6))
    min_size = float(octave_base_scale * strides[0])
    lvl = jnp.clip(jnp.floor(jnp.log2(scale / min_size) + 0.5),
                   0, num_lvls - 1).astype(jnp.int32)     # (B, G)

    targets, weights = [], []
    total_cells = 0
    for li in range(num_lvls):
        h, w = featmap_sizes[li]
        s = float(strides[li])
        boxes = gt_bboxes / s

        def one_img(bx, lv, valid):
            sel = (lv == li) & valid
            pos = _paint(bx, sel, h, w, r1)
            ign = _paint(bx, sel, h, w, r2)
            near = (lv == li - 1) | (lv == li + 1)
            ign_nb = _paint(bx, near & valid, h, w, r2)
            t = pos.astype(jnp.float32)
            wgt = jnp.where(pos, 1.0,
                            jnp.where(ign | ign_nb, 0.0, 0.1))
            return t, wgt

        t, wgt = jax.vmap(one_img)(boxes, lvl, gt_valid)
        targets.append(t)
        weights.append(wgt)
        total_cells += b * h * w
    return targets, weights, total_cells / 200.0


def ga_shape_targets(squares_flat, approxs_flat, gt_bboxes, gt_valid, rng,
                     pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
                     sample_num=256, pos_fraction=0.5):
    """Single-image shape targets (vmap over batch): approx-max-IoU
    assignment of squares, GA-sampled positives keep their matched gt as
    the regression target (reference ``_ga_shape_target_single``)."""
    cells = squares_flat.shape[0]
    octave = approxs_flat.shape[1]
    iou = bbox_overlaps(approxs_flat.reshape(cells * octave, 4), gt_bboxes)
    iou = jnp.max(iou.reshape(cells, octave, -1), axis=1)  # (cells, G)
    assigned, _ = max_iou_assign(
        squares_flat, gt_bboxes, gt_valid, pos_iou_thr, neg_iou_thr,
        min_pos_iou=min_pos_iou, match_low_quality=True, overlaps=iou)
    res = random_sample(rng, assigned, num=min(sample_num, cells),
                        pos_fraction=pos_fraction)
    # scatter sampled positives back to the dense cell grid
    pos_mask = jnp.zeros(cells, bool).at[res["inds"]].set(res["is_pos"])
    matched = jnp.maximum(assigned - 1, 0)
    bbox_gts = gt_bboxes[matched]
    n_sampled = jnp.sum(res["valid"])
    return pos_mask, bbox_gts, n_sampled


def ga_rpn_loss(cls_scores, bbox_preds, shape_preds, loc_preds,
                squares_levels, approxs_levels, gt_bboxes, gt_valid, rng,
                train_cfg, strides, octave_base_scale,
                featmap_sizes):
    """Full GA-RPN loss (reference ``guided_anchor_head.py:646-723``):
    focal loc loss, bounded-IoU shape loss, and the standard RPN cls/reg
    losses computed on the PREDICTED (guided) anchors."""
    b = cls_scores[0].shape[0]
    ga_cfg = dict(train_cfg.get("ga_assigner", {}))
    samp_cfg = dict(train_cfg.get("ga_sampler", {}))

    # ---- loc
    loc_t, loc_w, loc_avg = ga_loc_targets(
        gt_bboxes, gt_valid, featmap_sizes, strides, octave_base_scale,
        center_ratio=train_cfg.get("center_ratio", 0.2),
        ignore_ratio=train_cfg.get("ignore_ratio", 0.5))
    loss_loc = 0.0
    for lp, t, wgt in zip(loc_preds, loc_t, loc_w):
        loss_loc = loss_loc + sigmoid_focal_loss(
            lp[..., 0], t, weight=wgt, avg_factor=loc_avg)

    # ---- shape
    squares_flat = jnp.concatenate(squares_levels, 0)       # (cells, 4)
    approxs_flat = jnp.concatenate(approxs_levels, 0)       # (cells, 9, 4)
    rngs = jax.random.split(rng, b)
    pos_mask, bbox_gts, n_sampled = jax.vmap(
        lambda r, gb, gv: ga_shape_targets(
            squares_flat, approxs_flat, gb, gv, r,
            pos_iou_thr=ga_cfg.get("pos_iou_thr", 0.7),
            neg_iou_thr=ga_cfg.get("neg_iou_thr", 0.3),
            min_pos_iou=ga_cfg.get("min_pos_iou", 0.3),
            sample_num=samp_cfg.get("num", 256),
            pos_fraction=samp_cfg.get("pos_fraction", 0.5))
    )(rngs, gt_bboxes, gt_valid)
    shape_flat = jnp.concatenate(
        [s.reshape(b, -1, 2) for s in shape_preds], 1)      # (B, cells, 2)
    guided = jax.vmap(lambda sp: decode_guided_anchors(squares_flat, sp))(
        shape_flat)                                         # (B, cells, 4)
    w_pos = pos_mask.astype(jnp.float32)
    loss_shape = jnp.sum(
        bounded_iou_loss(guided, bbox_gts,
                         beta=train_cfg.get("shape_beta", 0.2))
        * w_pos[..., None] * 0.5) \
        / jnp.maximum(jnp.sum(n_sampled), 1.0)

    # ---- cls/reg on the guided anchors (per image, traced anchors)
    cls_flat = jnp.concatenate(
        [s.reshape(b, -1) for s in cls_scores], 1).astype(jnp.float32)
    reg_flat = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in bbox_preds], 1).astype(jnp.float32)
    rngs2 = jax.random.split(jax.random.fold_in(rng, 1), b)
    anchors_sg = jax.lax.stop_gradient(guided)
    labels, lw, bt, bw, ns = jax.vmap(
        lambda r, anc, gtb, gtv: rpn_targets(
            r, anc, gtb, gtv, dict(train_cfg["assigner"]),
            dict(train_cfg["sampler"]))
    )(rngs2, anchors_sg, gt_bboxes, gt_valid)
    num_total = jnp.maximum(jnp.sum(ns), 1.0)
    loss_cls = binary_cross_entropy(cls_flat, labels, lw,
                                    avg_factor=num_total)
    loss_bbox = l1_loss(reg_flat, bt, bw, avg_factor=num_total)
    return {"loss_rpn_cls": loss_cls, "loss_rpn_bbox": loss_bbox,
            "loss_rpn_shape": loss_shape, "loss_rpn_loc": loss_loc}


def ga_proposals_single(cls_scores, bbox_preds, shape_preds, loc_preds,
                        squares_levels, img_shape, cfg,
                        loc_filter_thr=0.01):
    """Single-image proposals (vmap over batch): guided anchors per
    level, objectness masked by the loc filter (the MaskedConv
    inference equivalence), per-level top-k + level-offset NMS."""
    from ...core.boxes import clip_boxes
    nms_pre = int(cfg.get("nms_pre", 1000))
    boxes_all, scores_all, lvl_all = [], [], []
    for li, (cs, bp, sp, lp, sq) in enumerate(
            zip(cls_scores, bbox_preds, shape_preds, loc_preds,
                squares_levels)):
        guided = decode_guided_anchors(sq, sp.reshape(-1, 2))
        score = jax.nn.sigmoid(cs.reshape(-1))
        loc_keep = jax.nn.sigmoid(lp.reshape(-1)) >= loc_filter_thr
        score = jnp.where(loc_keep, score, 0.0)
        k = min(nms_pre, score.shape[0])
        top, idx = jax.lax.top_k(score, k)
        dec = delta2bbox(guided[idx], bp.reshape(-1, 4)[idx],
                         (0., 0., 0., 0.), (1., 1., 1., 1.))
        dec = clip_boxes(dec, img_shape)
        boxes_all.append(dec)
        scores_all.append(top)
        lvl_all.append(jnp.full((k,), li, jnp.int32))
    boxes = jnp.concatenate(boxes_all, 0)
    scores = jnp.concatenate(scores_all, 0)
    lvls = jnp.concatenate(lvl_all, 0)
    keep = batched_nms(boxes, scores, lvls,
                       float(cfg.get("nms_thr", 0.7)),
                       valid=scores > 0)
    s_k = jnp.where(keep, scores, 0.0)
    max_num = int(cfg.get("max_num", 1000))
    top, idx = jax.lax.top_k(s_k, min(max_num, s_k.shape[0]))
    return boxes[idx], top, top > 0


class GARetinaHead(nn.Module):
    """Guided-Anchor RetinaNet head (reference ``ga_retina_head.py:10-120``):
    retina conv towers, then loc/shape branches; cls and reg features are
    separately adapted by shape-driven deformable convs before the final
    masked cls/reg convs (masking realised by score filtering at
    inference, see GARPNHead notes)."""
    num_classes: int = 1
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        init = nn.initializers.normal(0.01)
        loc_bias = nn.initializers.constant(
            float(-np.log((1 - 0.01) / 0.01)))
        cls_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1), (1, 1)], dtype=self.dtype,
                             kernel_init=init, name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1), (1, 1)], dtype=self.dtype,
                             kernel_init=init, name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        conv_loc = nn.Conv(1, (1, 1), dtype=self.dtype, kernel_init=init,
                           bias_init=loc_bias, name="conv_loc")
        conv_shape = nn.Conv(2, (1, 1), dtype=self.dtype, kernel_init=init,
                             name="conv_shape")
        off_cls = nn.Conv(18, (1, 1), use_bias=False, dtype=self.dtype,
                          kernel_init=nn.initializers.zeros,
                          name="offset_cls")
        off_reg = nn.Conv(18, (1, 1), use_bias=False, dtype=self.dtype,
                          kernel_init=nn.initializers.zeros,
                          name="offset_reg")
        adapt_cls_k = self.param(
            "adaption_cls_kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (3, 3, self.feat_channels, self.feat_channels), jnp.float32)
        adapt_reg_k = self.param(
            "adaption_reg_kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (3, 3, self.feat_channels, self.feat_channels), jnp.float32)
        retina_cls = nn.Conv(self.num_classes, (3, 3),
                             padding=[(1, 1), (1, 1)], dtype=self.dtype,
                             kernel_init=init, bias_init=loc_bias,
                             name="retina_cls")
        retina_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                             dtype=self.dtype, kernel_init=init,
                             name="retina_reg")
        outs = []
        for x in feats:
            c = r = x.astype(self.dtype)
            for i in range(self.stacked_convs):
                c = nn.relu(cls_convs[i](c))
                r = nn.relu(reg_convs[i](r))
            loc = conv_loc(c).astype(jnp.float32)
            shape = conv_shape(r).astype(jnp.float32)
            sp_sg = jax.lax.stop_gradient(shape).astype(self.dtype)
            c = nn.relu(deform_conv2d(
                c, off_cls(sp_sg).astype(jnp.float32),
                adapt_cls_k.astype(self.dtype)))
            r = nn.relu(deform_conv2d(
                r, off_reg(sp_sg).astype(jnp.float32),
                adapt_reg_k.astype(self.dtype)))
            outs.append((retina_cls(c).astype(jnp.float32),
                         retina_reg(r).astype(jnp.float32), shape, loc))
        return tuple(zip(*outs))


def ga_retina_loss(cls_scores, bbox_preds, shape_preds, loc_preds,
                   squares_levels, approxs_levels, gt_bboxes, gt_valid,
                   gt_labels, num_classes, rng, train_cfg, strides,
                   octave_base_scale, featmap_sizes, gamma=2.0,
                   alpha=0.25):
    """GA-RetinaNet loss (reference ``guided_anchor_head.py`` loss with
    the retina focal cls): GA loc/shape losses as in ga_rpn_loss, plus
    all-anchor focal cls + L1 reg computed on the per-image GUIDED
    anchors."""
    from .retina_head import retina_targets
    from ..losses import l1_loss as _l1
    b = cls_scores[0].shape[0]
    ga_cfg = dict(train_cfg.get("ga_assigner", {}))
    samp_cfg = dict(train_cfg.get("ga_sampler", {}))

    loc_t, loc_w, loc_avg = ga_loc_targets(
        gt_bboxes, gt_valid, featmap_sizes, strides, octave_base_scale,
        center_ratio=train_cfg.get("center_ratio", 0.2),
        ignore_ratio=train_cfg.get("ignore_ratio", 0.5))
    loss_loc = 0.0
    for lp, t, wgt in zip(loc_preds, loc_t, loc_w):
        loss_loc = loss_loc + sigmoid_focal_loss(
            lp[..., 0], t, weight=wgt, avg_factor=loc_avg)

    squares_flat = jnp.concatenate(squares_levels, 0)
    approxs_flat = jnp.concatenate(approxs_levels, 0)
    rngs = jax.random.split(rng, b)
    pos_mask, bbox_gts, n_sampled = jax.vmap(
        lambda r, gb, gv: ga_shape_targets(
            squares_flat, approxs_flat, gb, gv, r,
            pos_iou_thr=ga_cfg.get("pos_iou_thr", 0.5),
            neg_iou_thr=ga_cfg.get("neg_iou_thr", 0.4),
            min_pos_iou=ga_cfg.get("min_pos_iou", 0.0),
            sample_num=samp_cfg.get("num", 256),
            pos_fraction=samp_cfg.get("pos_fraction", 0.5))
    )(rngs, gt_bboxes, gt_valid)
    shape_flat = jnp.concatenate(
        [s.reshape(b, -1, 2) for s in shape_preds], 1)
    guided = jax.vmap(lambda sp: decode_guided_anchors(squares_flat, sp))(
        shape_flat)
    w_pos = pos_mask.astype(jnp.float32)
    loss_shape = jnp.sum(
        bounded_iou_loss(guided, bbox_gts,
                         beta=train_cfg.get("shape_beta", 0.2))
        * w_pos[..., None] * 0.5) \
        / jnp.maximum(jnp.sum(n_sampled), 1.0)

    cls_flat = jnp.concatenate(
        [s.reshape(b, -1, num_classes) for s in cls_scores],
        1).astype(jnp.float32)
    reg_flat = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in bbox_preds], 1).astype(jnp.float32)
    anchors_sg = jax.lax.stop_gradient(guided)
    onehot, cls_w, bt, bw, npos, _aux = jax.vmap(
        lambda anc, gb, gv, gl: retina_targets(
            anc, gb, gv, gl, num_classes,
            dict(train_cfg["assigner"]))
    )(anchors_sg, gt_bboxes, gt_valid, gt_labels)
    total_pos = jnp.maximum(jnp.sum(npos), 1.0)
    loss_cls = sigmoid_focal_loss(cls_flat, onehot, gamma, alpha,
                                  cls_w[..., None], avg_factor=total_pos)
    loss_bbox = _l1(reg_flat, bt, bw, avg_factor=total_pos)
    return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
            "loss_shape": loss_shape, "loss_loc": loss_loc}


def ga_retina_bboxes_single(cls_scores, bbox_preds, shape_preds,
                            loc_preds, squares_levels, img_shape,
                            num_classes, cfg, target_stds=(1., 1., 1., 1.),
                            loc_filter_thr=0.01):
    """Single-image GA-RetinaNet decode: guided anchors, loc-filtered
    sigmoid scores, per-level top-k, multiclass NMS."""
    from ...core.nms import multiclass_nms
    from ...core.boxes import clip_boxes
    nms_pre = int(cfg.get("nms_pre", 1000))
    boxes_all, scores_all = [], []
    for cs, bp, sp, lp, sq in zip(cls_scores, bbox_preds, shape_preds,
                                  loc_preds, squares_levels):
        guided = decode_guided_anchors(sq, sp.reshape(-1, 2))
        s = jax.nn.sigmoid(cs.reshape(-1, num_classes))
        loc_keep = jax.nn.sigmoid(lp.reshape(-1)) >= loc_filter_thr
        s = s * loc_keep[:, None]
        k = min(nms_pre, s.shape[0])
        _, idx = jax.lax.top_k(jnp.max(s, -1), k)
        dec = delta2bbox(guided[idx], bp.reshape(-1, 4)[idx],
                         (0., 0., 0., 0.), tuple(target_stds))
        boxes_all.append(clip_boxes(dec, img_shape))
        scores_all.append(s[idx])
    boxes = jnp.concatenate(boxes_all, 0)
    scores = jnp.concatenate(scores_all, 0)
    scores = jnp.concatenate([scores,
                              jnp.zeros((scores.shape[0], 1))], -1)
    return multiclass_nms(boxes, scores, cfg.get("score_thr", 0.05),
                          dict(cfg.get("nms", dict(type="nms",
                                                   iou_threshold=0.5))),
                          cfg.get("max_per_img", 100))
