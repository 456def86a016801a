"""FoveaBox: anchor-free per-pixel detection head.

reference: ``mmdet/models/dense_heads/fovea_head.py`` (arXiv 1904.03797).
Per level: gts whose sqrt-area falls in the level's scale range label the
sigma-shrunk "fovea" of their box; targets are log of base-edge-normalised
point-to-side distances.  The reference's per-gt python paint loop (sorted
by descending area so the SMALLEST gt wins overwrites) becomes a batched
masked arg-min over gts per point.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.nms import multiclass_nms
from ..losses import sigmoid_focal_loss, smooth_l1_loss


class FoveaHead(nn.Module):
    """cls/reg conv towers (reference ``fovea_head.py:64-112``).

    ``with_deform`` (reference *fovea_align* configs): the cls feature is
    re-sampled by a deformable conv whose offsets come from the exp'd reg
    prediction (FeatureAlign), and the towers use GroupNorm when
    ``use_gn`` (the *gn-head* config axis)."""
    num_classes: int = 1
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    with_deform: bool = False
    use_gn: bool = False
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
        ng = min(32, self.feat_channels)
        gn_c = [nn.GroupNorm(num_groups=ng, dtype=self.dtype,
                             name=f"cls_gn{i}")
                for i in range(self.stacked_convs)] if self.use_gn else None
        gn_r = [nn.GroupNorm(num_groups=ng, dtype=self.dtype,
                             name=f"reg_gn{i}")
                for i in range(self.stacked_convs)] if self.use_gn else None
        bias_init = nn.initializers.constant(
            float(-np.log((1 - 0.01) / 0.01)))
        conv_cls = nn.Conv(self.num_classes, (3, 3),
                           padding=[(1, 1), (1, 1)], dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=bias_init, name="fovea_cls")
        conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype,
                           kernel_init=nn.initializers.normal(0.01),
                           name="fovea_reg")
        if self.with_deform:
            align_off = nn.Conv(18, (1, 1), use_bias=False,
                                dtype=self.dtype,
                                kernel_init=nn.initializers.zeros,
                                name="align_offset")
            align_kernel = self.param(
                "align_kernel",
                nn.initializers.variance_scaling(2.0, "fan_out",
                                                 "normal"),
                (3, 3, self.feat_channels, self.feat_channels),
                jnp.float32)
        cls_out, reg_out = [], []
        for x in feats:
            c = r = x
            for i in range(self.stacked_convs):
                c = cls_convs[i](c)
                r = reg_convs[i](r)
                if self.use_gn:
                    c = gn_c[i](c)
                    r = gn_r[i](r)
                c = nn.relu(c)
                r = nn.relu(r)
            reg = conv_reg(r).astype(jnp.float32)
            if self.with_deform:
                from ...ops.deform_conv import deform_conv2d
                off = align_off(jnp.exp(reg).astype(self.dtype))
                c = nn.relu(deform_conv2d(
                    c, off.astype(jnp.float32),
                    align_kernel.astype(c.dtype)))
            cls_out.append(conv_cls(c).astype(jnp.float32))
            reg_out.append(reg)
        return cls_out, reg_out


def _level_points(h, w):
    y = jnp.arange(h, dtype=jnp.float32) + 0.5
    x = jnp.arange(w, dtype=jnp.float32) + 0.5
    return jnp.meshgrid(y, x, indexing="ij")


def fovea_targets_level(gt_bboxes, gt_valid, gt_labels, h, w, stride,
                        base_len, bounds, sigma, num_classes):
    """Per-level targets for one image: (h*w,) labels + (h*w, 4) log
    targets.  Matches the reference paint-loop semantics: among gts whose
    fovea covers the cell and whose scale fits the level, the smallest
    area wins."""
    lower, upper = bounds
    areas = jnp.sqrt(jnp.clip(
        (gt_bboxes[:, 2] - gt_bboxes[:, 0])
        * (gt_bboxes[:, 3] - gt_bboxes[:, 1]), 0))
    hit = gt_valid & (areas >= lower) & (areas <= upper)

    gb = gt_bboxes / stride
    half_w = 0.5 * (gb[:, 2] - gb[:, 0])
    half_h = 0.5 * (gb[:, 3] - gb[:, 1])
    pl = jnp.clip(jnp.ceil(gb[:, 0] + (1 - sigma) * half_w - 0.5),
                  0, w - 1)
    pr = jnp.clip(jnp.floor(gb[:, 0] + (1 + sigma) * half_w - 0.5),
                  0, w - 1)
    pt = jnp.clip(jnp.ceil(gb[:, 1] + (1 - sigma) * half_h - 0.5),
                  0, h - 1)
    pd = jnp.clip(jnp.floor(gb[:, 1] + (1 + sigma) * half_h - 0.5),
                  0, h - 1)

    ys, xs = _level_points(h, w)                       # cell centers (+0.5)
    iy = jnp.arange(h, dtype=jnp.float32)[:, None, None]   # (h, 1, 1)
    ix = jnp.arange(w, dtype=jnp.float32)[None, :, None]   # (1, w, 1)
    inside = ((ix >= pl[None, None]) & (ix <= pr[None, None])
              & (iy >= pt[None, None]) & (iy <= pd[None, None])
              & hit[None, None])                       # (h, w, G)
    # smallest-area hit wins
    key = jnp.where(inside, areas[None, None], jnp.inf)
    best = jnp.argmin(key, axis=-1)                    # (h, w)
    any_hit = jnp.any(inside, axis=-1)
    labels = jnp.where(any_hit, gt_labels[best], num_classes)

    gsel = gt_bboxes[best]                             # (h, w, 4)
    px = (xs - 0.5) * stride                           # reference uses x grid
    py = (ys - 0.5) * stride
    # reference channel order: (x-x1, y-y1, x2-x, y2-y) / base_len
    t = jnp.stack([(px - gsel[..., 0]) / base_len,
                   (py - gsel[..., 1]) / base_len,
                   (gsel[..., 2] - px) / base_len,
                   (gsel[..., 3] - py) / base_len], -1)
    t = jnp.log(jnp.clip(t, 1.0 / 16, 16.0))
    t = jnp.where(any_hit[..., None], t, 0.0)
    return (labels.reshape(-1).astype(jnp.int32), t.reshape(-1, 4),
            any_hit.reshape(-1))


def fovea_loss(cls_scores, bbox_preds, gt_bboxes, gt_valid, gt_labels,
               num_classes, strides=(8, 16, 32, 64, 128),
               base_edge_list=(16, 32, 64, 128, 256),
               scale_ranges=((8, 32), (16, 64), (32, 128), (64, 256),
                             (128, 512)),
               sigma=0.4, gamma=2.0, alpha=0.25, bbox_beta=0.11,
               loss_bbox_weight=1.0):
    """Batched FoveaBox loss (reference ``fovea_head.py:126-176``)."""
    b = cls_scores[0].shape[0]
    labels_all, targets_all, pos_all = [], [], []
    for cs, st, bl, bounds in zip(cls_scores, strides, base_edge_list,
                                  scale_ranges):
        h, w = cs.shape[1:3]
        lab, tgt, pos = jax.vmap(
            lambda gb, gv, gl: fovea_targets_level(
                gb, gv, gl, h, w, float(st), float(bl), bounds, sigma,
                num_classes))(gt_bboxes, gt_valid, gt_labels)
        labels_all.append(lab)
        targets_all.append(tgt)
        pos_all.append(pos)
    labels = jnp.concatenate(labels_all, 1)            # (B, P)
    targets = jnp.concatenate(targets_all, 1)          # (B, P, 4)
    pos = jnp.concatenate(pos_all, 1)                  # (B, P)
    cls_flat = jnp.concatenate(
        [c.reshape(b, -1, num_classes) for c in cls_scores], 1)
    reg_flat = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in bbox_preds], 1)

    num_pos = jnp.sum(pos)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    loss_cls = sigmoid_focal_loss(cls_flat, onehot, gamma, alpha,
                                  avg_factor=num_pos + b)
    w = jnp.broadcast_to(pos[..., None], targets.shape).astype(jnp.float32)
    loss_bbox = loss_bbox_weight * smooth_l1_loss(
        reg_flat, targets, bbox_beta, w,
        avg_factor=jnp.maximum(num_pos, 1.0) * 4)
    return {"loss_cls": loss_cls, "loss_bbox": loss_bbox}


def fovea_bboxes_single(cls_scores, bbox_preds, img_shape, num_classes,
                        cfg, strides=(8, 16, 32, 64, 128),
                        base_edge_list=(16, 32, 64, 128, 256)):
    """Single-image FoveaBox inference (reference ``get_bboxes_single``)."""
    nms_pre = int(cfg.get("nms_pre", 1000))
    boxes_all, scores_all = [], []
    for cs, bp, st, bl in zip(cls_scores, bbox_preds, strides,
                              base_edge_list):
        h, w = cs.shape[0:2]
        s = jax.nn.sigmoid(cs.reshape(-1, num_classes))
        t = jnp.exp(bp.reshape(-1, 4))
        ys, xs = _level_points(h, w)
        px = ((xs - 0.5) * st).reshape(-1)
        py = ((ys - 0.5) * st).reshape(-1)
        x1 = jnp.clip(px - bl * t[:, 0], 0, img_shape[1])
        y1 = jnp.clip(py - bl * t[:, 1], 0, img_shape[0])
        x2 = jnp.clip(px + bl * t[:, 2], 0, img_shape[1])
        y2 = jnp.clip(py + bl * t[:, 3], 0, img_shape[0])
        boxes = jnp.stack([x1, y1, x2, y2], -1)
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
