"""RepPoints: point-set representation with two-stage refinement.

reference: ``mmdet/models/dense_heads/reppoints_head.py`` +
``mmdet/core/bbox/assigners/point_assigner.py`` (arXiv 1904.11490).

Per level the head predicts ``num_points`` (y, x) offsets twice: an
*init* set from a plain conv and a *refine* set from a deformable conv
whose sampling offsets ARE the (gradient-attenuated) init points — the
point set both localises the object and steers feature sampling.  Boxes
come from the point set via the *moment* transform (mean ± std * learned
scale).  Init stage is supervised through a PointAssigner (k nearest
level-matched points per gt), refine + classification through MaxIoU
assignment on the init-decoded boxes.

TPU redesign: the reference's per-gt sequential assignment loop becomes
a dense (G, P) distance matrix with per-point argmin (same result up to
equal-distance ties); all targets are batched masked ops on the
flattened level set.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.assigners import max_iou_assign
from ...core.nms import multiclass_nms
from ...ops.deform_conv import deform_conv2d
from ..losses import sigmoid_focal_loss, smooth_l1_loss


class RepPointsHead(nn.Module):
    """reference ``reppoints_head.py:107-149``.

    Variant axes (reference ``configs/reppoints/``): ``transform_method``
    moment / minmax / partial_minmax, ``use_grid_points`` (bbox-grid
    representation, *bbox_r50_grid* configs) and ``center_init``."""
    num_classes: int = 1
    in_channels: int = 256
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    num_points: int = 9
    gradient_mul: float = 0.1
    moment_mul: float = 0.01
    num_levels: int = 5
    transform_method: str = "moment"
    use_grid_points: bool = False
    center_init: bool = True
    point_base_scale: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        kk = int(np.sqrt(self.num_points))
        assert kk * kk == self.num_points, "num_points must be a square"
        pad = (kk - 1) // 2
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        ng = min(32, self.feat_channels)
        cls_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1), (1, 1)], dtype=self.dtype,
                             kernel_init=kaiming, name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1), (1, 1)], dtype=self.dtype,
                             kernel_init=kaiming, name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        gn_c = [nn.GroupNorm(num_groups=ng, dtype=self.dtype,
                             name=f"cls_gn{i}")
                for i in range(self.stacked_convs)]
        gn_r = [nn.GroupNorm(num_groups=ng, dtype=self.dtype,
                             name=f"reg_gn{i}")
                for i in range(self.stacked_convs)]
        pts_init_conv = nn.Conv(self.point_feat_channels, (3, 3),
                                padding=[(1, 1), (1, 1)], dtype=self.dtype,
                                kernel_init=nn.initializers.normal(0.01),
                                name="pts_init_conv")
        pts_out_dim = 4 if self.use_grid_points else 2 * self.num_points
        pts_init_out = nn.Conv(pts_out_dim, (1, 1),
                               dtype=self.dtype,
                               kernel_init=nn.initializers.normal(0.01),
                               name="pts_init_out")
        bias_init = nn.initializers.constant(
            float(-np.log((1 - 0.01) / 0.01)))
        cls_out_conv = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                               kernel_init=nn.initializers.normal(0.01),
                               bias_init=bias_init, name="cls_out")
        pts_refine_out = nn.Conv(pts_out_dim, (1, 1),
                                 dtype=self.dtype,
                                 kernel_init=nn.initializers.normal(0.01),
                                 name="pts_refine_out")
        # deformable conv kernels (weights only; offsets computed here)
        cls_dcn_w = self.param(
            "cls_dcn_kernel", nn.initializers.normal(0.01),
            (kk, kk, self.feat_channels, self.point_feat_channels))
        ref_dcn_w = self.param(
            "refine_dcn_kernel", nn.initializers.normal(0.01),
            (kk, kk, self.feat_channels, self.point_feat_channels))
        moment_transfer = self.param("moment_transfer",
                                     nn.initializers.zeros, (2,))

        # y-first base grid of the kk x kk DCN kernel
        by, bx = np.meshgrid(np.arange(-pad, pad + 1),
                             np.arange(-pad, pad + 1), indexing="ij")
        base = jnp.asarray(
            np.stack([by.ravel(), bx.ravel()], 1).reshape(-1),
            jnp.float32)                                     # (2*KK,) y-first

        # grid/center-off init: points start on a regular grid over a
        # point_base_scale box (reference forward_single:256-264)
        scale = self.point_base_scale / 2.0
        points_init0 = base / jnp.max(jnp.abs(base)) * scale
        bbox_init0 = jnp.asarray([-scale, -scale, scale, scale],
                                 jnp.float32)

        cls_out, init_out, refine_out = [], [], []
        for x in feats:
            c = r = x
            for i in range(self.stacked_convs):
                c = nn.relu(gn_c[i](cls_convs[i](c)))
                r = nn.relu(gn_r[i](reg_convs[i](r)))
            raw_init = pts_init_out(
                nn.relu(pts_init_conv(r))).astype(jnp.float32)
            if self.use_grid_points:
                prev = jnp.broadcast_to(bbox_init0,
                                        raw_init.shape[:-1] + (4,))
                pts_init, bbox_out_init = _gen_grid_from_reg(
                    raw_init, prev, kk)
            else:
                pts_init = raw_init
                if not self.center_init:
                    pts_init = pts_init + points_init0[None, None, None, :]
                bbox_out_init = None
            pts_mix = (1 - self.gradient_mul) * \
                jax.lax.stop_gradient(pts_init) + \
                self.gradient_mul * pts_init
            dcn_off = pts_mix - base[None, None, None, :]
            cdtype = c.dtype
            cls_feat = nn.relu(deform_conv2d(
                c, dcn_off.astype(cdtype), cls_dcn_w.astype(cdtype)))
            ref_feat = nn.relu(deform_conv2d(
                r, dcn_off.astype(cdtype), ref_dcn_w.astype(cdtype)))
            cls_out.append(cls_out_conv(cls_feat).astype(jnp.float32))
            init_out.append(pts_init)
            raw_refine = pts_refine_out(ref_feat).astype(jnp.float32)
            if self.use_grid_points:
                pts_refine, _ = _gen_grid_from_reg(
                    raw_refine, jax.lax.stop_gradient(bbox_out_init), kk)
            else:
                pts_refine = raw_refine + jax.lax.stop_gradient(pts_init)
            refine_out.append(pts_refine)
        return cls_out, init_out, refine_out, moment_transfer


def _gen_grid_from_reg(reg, prev_boxes, kk):
    """(dx, dy, dw, dh) regression from ``prev_boxes`` -> a kk x kk point
    grid over the regressed box (reference ``gen_grid_from_reg:216-247``).

    reg/prev_boxes: (..., 4) NHWC-last; returns (grid_yx (..., 2*kk*kk)
    y-first, regressed boxes (..., 4))."""
    cxy = (prev_boxes[..., :2] + prev_boxes[..., 2:]) * 0.5
    wh = jnp.clip(prev_boxes[..., 2:] - prev_boxes[..., :2], 1e-6)
    tl = cxy + wh * reg[..., :2] - 0.5 * wh * jnp.exp(reg[..., 2:])
    new_wh = wh * jnp.exp(reg[..., 2:])
    t = jnp.linspace(0.0, 1.0, kk)
    # grid_y varies along the first kernel axis, grid_x along the second
    gy = tl[..., 1:2] + new_wh[..., 1:2] * t            # (..., kk)
    gx = tl[..., 0:1] + new_wh[..., 0:1] * t            # (..., kk)
    gy2 = jnp.repeat(gy[..., :, None], kk, axis=-1)     # (..., kk, kk)
    gx2 = jnp.repeat(gx[..., None, :], kk, axis=-2)     # (..., kk, kk)
    grid = jnp.stack([gy2, gx2], -1)                    # (..., kk, kk, 2)
    grid = grid.reshape(grid.shape[:-3] + (2 * kk * kk,))
    boxes = jnp.concatenate([tl, tl + new_wh], -1)
    return grid, boxes


def points2bbox_moment(pts_xy, moment_transfer, moment_mul=0.01):
    """Moment transform: mean ± std * exp(learned transfer) (reference
    ``points2bbox`` 'moment' branch).  ``pts_xy``: (..., n, 2) x-y."""
    mean = jnp.mean(pts_xy, axis=-2, keepdims=True)
    # sqrt(var + eps), not jnp.std: at init some levels predict exactly
    # zero offsets, all points coincide, and d(sqrt)/d(0) would be NaN
    var = jnp.mean((pts_xy - mean) ** 2, axis=-2)          # (..., 2)
    std = jnp.sqrt(var + 1e-12)
    mean = mean[..., 0, :]
    mt = (moment_transfer * moment_mul
          + jax.lax.stop_gradient(moment_transfer) * (1 - moment_mul))
    half = std * jnp.exp(mt)                               # (..., 2)
    return jnp.concatenate([mean - half, mean + half], axis=-1)


def points2bbox(pts_xy, moment_transfer=None, moment_mul=0.01,
                method="moment"):
    """Point set -> bbox under the configured transform (reference
    ``points2bbox:175-215``: moment / minmax / partial_minmax)."""
    if method == "moment":
        return points2bbox_moment(pts_xy, moment_transfer, moment_mul)
    if method == "partial_minmax":
        pts_xy = pts_xy[..., :4, :]
    elif method != "minmax":
        raise KeyError(f"unknown transform_method {method}")
    mn = jnp.min(pts_xy, axis=-2)
    mx = jnp.max(pts_xy, axis=-2)
    return jnp.concatenate([mn, mx], axis=-1)


def _pts_yfirst_to_xy(pred, num_points):
    """(..., 2n) y-first channel pairs -> (..., n, 2) x-y points."""
    p = pred.reshape(pred.shape[:-1] + (num_points, 2))
    return jnp.stack([p[..., 1], p[..., 0]], -1)


def point_assign(points_xy, points_lvl, gt_bboxes, gt_valid, scale=4,
                 pos_num=1):
    """Batched PointAssigner (reference ``point_assigner.py:23-135``):
    for each gt, its ``pos_num`` nearest points on its matched level are
    positives; a point contested by several gts goes to the closest.

    Returns (assigned (P,) int32: 0 bg / gt_idx+1, matched gt per point).
    """
    lvl_min = jnp.min(points_lvl)
    lvl_max = jnp.max(points_lvl)
    cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) * 0.5
    cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) * 0.5
    w = jnp.clip(gt_bboxes[:, 2] - gt_bboxes[:, 0], 1e-6)
    h = jnp.clip(gt_bboxes[:, 3] - gt_bboxes[:, 1], 1e-6)
    glvl = jnp.clip(((jnp.log2(w / scale) + jnp.log2(h / scale))
                     / 2).astype(jnp.int32), lvl_min, lvl_max)
    d = jnp.sqrt(((points_xy[None, :, 0] - cx[:, None]) / w[:, None]) ** 2
                 + ((points_xy[None, :, 1] - cy[:, None]) / h[:, None]) ** 2)
    lvl_ok = points_lvl[None, :] == glvl[:, None]
    d = jnp.where(lvl_ok & gt_valid[:, None], d, jnp.inf)   # (G, P)
    # per-gt pos_num nearest points
    neg_d, top_idx = jax.lax.top_k(-d, pos_num)             # (G, K)
    is_top = jnp.zeros_like(d, dtype=bool)
    garange = jnp.arange(d.shape[0])[:, None]
    is_top = is_top.at[garange, top_idx].set(True)
    is_top = is_top & jnp.isfinite(d)
    cand = jnp.where(is_top, d, jnp.inf)
    best_gt = jnp.argmin(cand, axis=0)                      # (P,)
    has = jnp.isfinite(jnp.min(cand, axis=0))
    return jnp.where(has, best_gt + 1, 0).astype(jnp.int32)


def reppoints_loss(cls_scores, pts_init, pts_refine, moment_transfer,
                   centers_flat, strides_flat, lvl_flat, gt_bboxes,
                   gt_valid, gt_labels, num_classes, num_points=9,
                   point_base_scale=4, gamma=2.0, alpha=0.25,
                   init_assign_scale=4, init_pos_num=1,
                   refine_pos_iou=0.5, refine_neg_iou=0.4,
                   loss_init_weight=0.5, loss_refine_weight=1.0,
                   bbox_beta=0.11, transform_method="moment",
                   init_assigner="point", init_pos_iou=0.5,
                   init_neg_iou=0.4):
    """Batched RepPoints loss (reference ``reppoints_head.py:528-659``)."""
    b = cls_scores[0].shape[0]
    cls_flat = jnp.concatenate(
        [c.reshape(b, -1, num_classes) for c in cls_scores], 1)
    init_flat = jnp.concatenate(
        [p.reshape(b, -1, 2 * num_points) for p in pts_init], 1)
    refine_flat = jnp.concatenate(
        [p.reshape(b, -1, 2 * num_points) for p in pts_refine], 1)

    # decoded point coordinates (image space)
    def decode(pred_flat):
        xy = _pts_yfirst_to_xy(pred_flat, num_points)       # (B,P,n,2)
        return xy * strides_flat[None, :, None, None] \
            + centers_flat[None, :, None, :]

    init_xy = decode(init_flat)
    refine_xy = decode(refine_flat)
    bbox_init = points2bbox(init_xy, moment_transfer,
                            method=transform_method)
    bbox_refine = points2bbox(refine_xy, moment_transfer,
                              method=transform_method)
    norm = point_base_scale * strides_flat                  # (P,)

    # ---- init stage: PointAssigner on the centers (or, for the
    # grid-points configs, MaxIoU on point_base_scale squares — reference
    # bbox_r50_grid_fpn's ``init.assigner=MaxIoUAssigner`` override) ----
    if init_assigner == "max_iou":
        half = (point_base_scale * strides_flat * 0.5)[:, None]
        squares = jnp.concatenate([centers_flat - half,
                                   centers_flat + half], -1)

        def init_one(gb, gv):
            assigned, _ = max_iou_assign(
                squares, gb, gv, pos_iou_thr=init_pos_iou,
                neg_iou_thr=init_neg_iou, min_pos_iou=0.0,
                match_low_quality=True)
            matched = jnp.maximum(assigned - 1, 0)
            return assigned > 0, gb[matched]
    else:
        def init_one(gb, gv):
            assigned = point_assign(centers_flat, lvl_flat, gb, gv,
                                    scale=init_assign_scale,
                                    pos_num=init_pos_num)
            matched = jnp.maximum(assigned - 1, 0)
            return assigned > 0, gb[matched]

    pos_i, tgt_i = jax.vmap(init_one)(gt_bboxes, gt_valid)
    npos_i = jnp.maximum(jnp.sum(pos_i), 1.0)
    wi = jnp.broadcast_to(pos_i[..., None],
                          bbox_init.shape).astype(jnp.float32)
    loss_pts_init = loss_init_weight * smooth_l1_loss(
        bbox_init / norm[None, :, None], tgt_i / norm[None, :, None],
        bbox_beta, wi, avg_factor=npos_i)

    # ---- refine stage: MaxIoU assignment on init-decoded boxes ----
    boxes_for_assign = jax.lax.stop_gradient(bbox_init)

    def refine_one(boxes, gb, gv):
        assigned, _ = max_iou_assign(
            boxes, gb, gv, pos_iou_thr=refine_pos_iou,
            neg_iou_thr=refine_neg_iou, min_pos_iou=0.0,
            match_low_quality=True)
        matched = jnp.maximum(assigned - 1, 0)
        # assigned == -1 (between neg and pos thr): excluded from cls loss
        return assigned > 0, assigned >= 0, gb[matched], matched

    pos_r, cls_ok, tgt_r, match_r = jax.vmap(refine_one)(
        boxes_for_assign, gt_bboxes, gt_valid)
    npos_r = jnp.maximum(jnp.sum(pos_r), 1.0)
    wr = jnp.broadcast_to(pos_r[..., None],
                          bbox_refine.shape).astype(jnp.float32)
    loss_pts_refine = loss_refine_weight * smooth_l1_loss(
        bbox_refine / norm[None, :, None], tgt_r / norm[None, :, None],
        bbox_beta, wr, avg_factor=npos_r)

    bidx = jnp.arange(b)[:, None]
    labels = jnp.where(pos_r, gt_labels[bidx, match_r], num_classes)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    loss_cls = sigmoid_focal_loss(
        cls_flat, onehot, gamma, alpha,
        weight=cls_ok[..., None].astype(jnp.float32),
        avg_factor=npos_r)
    return {"loss_cls": loss_cls, "loss_pts_init": loss_pts_init,
            "loss_pts_refine": loss_pts_refine}


def reppoints_bboxes_single(cls_scores, pts_refine, moment_transfer,
                            centers_levels, strides, img_shape,
                            num_classes, cfg, num_points=9,
                            transform_method="moment"):
    """Single-image RepPoints inference (reference ``get_bboxes``)."""
    nms_pre = int(cfg.get("nms_pre", 1000))
    boxes_all, scores_all = [], []
    for cs, pr, ctr, st in zip(cls_scores, pts_refine, centers_levels,
                               strides):
        s = jax.nn.sigmoid(cs.reshape(-1, num_classes))
        xy = _pts_yfirst_to_xy(pr.reshape(-1, 2 * num_points), num_points)
        xy = xy * st + ctr[:, None, :]
        boxes = points2bbox(xy, moment_transfer,
                            method=transform_method)
        boxes = jnp.stack([
            jnp.clip(boxes[:, 0], 0, img_shape[1]),
            jnp.clip(boxes[:, 1], 0, img_shape[0]),
            jnp.clip(boxes[:, 2], 0, img_shape[1]),
            jnp.clip(boxes[:, 3], 0, img_shape[0])], -1)
        k = min(nms_pre, s.shape[0])
        _, idx = jax.lax.top_k(jnp.max(s, -1), k)
        boxes_all.append(boxes[idx])
        scores_all.append(s[idx])
    boxes = jnp.concatenate(boxes_all, 0)
    scores = jnp.concatenate(scores_all, 0)
    scores = jnp.concatenate(
        [scores, jnp.zeros((scores.shape[0], 1))], -1)
    return multiclass_nms(boxes, scores, cfg.get("score_thr", 0.05),
                          dict(cfg.get("nms", dict(type="nms",
                                                   iou_threshold=0.5))),
                          cfg.get("max_per_img", 100))
