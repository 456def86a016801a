"""Box / offset geometry in pure JAX.

Semantics match the reference detection core
(reference: ``mmdet/core/bbox/coder/delta_xywh_bbox_coder.py:74-197``,
``mmdet/core/bbox/coder/delta_xy_offset_coder.py:46-88``,
``mmdet/core/bbox/iou_calculators/iou2d_calculator.py:9-130``,
``mmdet/core/bbox/transforms.py``), rebuilt as batched, static-shape
functions that compose with vmap/jit — no per-image python loops.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..registry import Registry, build_from_cfg

BBOX_CODERS = Registry("bbox_coder")


def build_bbox_coder(cfg, **default_args):
    return build_from_cfg(cfg, BBOX_CODERS, default_args)


# --------------------------------------------------------------------------
# overlaps
# --------------------------------------------------------------------------

def bbox_area(boxes):
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def bbox_overlaps(boxes1, boxes2, mode="iou", is_aligned=False, eps=1e-6):
    """Pairwise IoU/IoF between ``(..., M, 4)`` and ``(..., N, 4)`` boxes.

    Returns ``(..., M, N)`` (or ``(..., M)`` when aligned).  Degenerate and
    zero-padded boxes produce overlap 0, matching the reference clamp-to-zero
    behaviour.
    """
    if is_aligned:
        lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
        rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
        wh = jnp.clip(rb - lt, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        area1 = bbox_area(boxes1)
        area2 = bbox_area(boxes2)
    else:
        lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
        rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
        wh = jnp.clip(rb - lt, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        area1 = bbox_area(boxes1)[..., :, None]
        area2 = bbox_area(boxes2)[..., None, :]
    if mode == "iou":
        union = area1 + area2 - inter
    elif mode == "iof":
        union = area1 if not is_aligned else area1
    else:
        raise ValueError(f"unknown mode {mode}")
    return inter / jnp.maximum(union, eps)


# --------------------------------------------------------------------------
# delta xywh coder
# --------------------------------------------------------------------------

def bbox2delta(proposals, gt, means=(0., 0., 0., 0.), stds=(1., 1., 1., 1.),
               eps=1e-7, legacy=False):
    """``legacy=True`` applies the MMDet v1.x ``+1`` size convention
    (reference ``legacy_delta_xywh_bbox_coder.py:82-128``;
    the legacy_1.x config family)."""
    off = 1.0 if legacy else 0.0
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0] + off
    ph = proposals[..., 3] - proposals[..., 1] + off
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0] + off
    gh = gt[..., 3] - gt[..., 1] + off
    # eps guards zero-size padded boxes; real proposals have positive size.
    pw = jnp.maximum(pw, eps)
    ph = jnp.maximum(ph, eps)
    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(jnp.maximum(gw, eps) / pw)
    dh = jnp.log(jnp.maximum(gh, eps) / ph)
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def delta2bbox(rois, deltas, means=(0., 0., 0., 0.), stds=(1., 1., 1., 1.),
               max_shape=None, wh_ratio_clip=16 / 1000, legacy=False):
    """Decode deltas on boxes.  ``deltas`` may be ``(..., 4*K)``.
    ``legacy=True``: MMDet v1.x ``+1`` size / ``-0.5`` corner convention
    (reference ``legacy_delta_xywh_bbox_coder.py:130-215``)."""
    off = 1.0 if legacy else 0.0
    num_classes = deltas.shape[-1] // 4
    d = deltas.reshape(deltas.shape[:-1] + (num_classes, 4))
    means = jnp.asarray(means, d.dtype)
    stds = jnp.asarray(stds, d.dtype)
    d = d * stds + means
    dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    px = ((rois[..., 0] + rois[..., 2]) * 0.5)[..., None]
    py = ((rois[..., 1] + rois[..., 3]) * 0.5)[..., None]
    pw = (rois[..., 2] - rois[..., 0] + off)[..., None]
    ph = (rois[..., 3] - rois[..., 1] + off)[..., None]
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy
    x1 = gx - gw * 0.5 + off * 0.5
    y1 = gy - gh * 0.5 + off * 0.5
    x2 = gx + gw * 0.5 - off * 0.5
    y2 = gy + gh * 0.5 - off * 0.5
    if max_shape is not None:
        h, w = max_shape[0], max_shape[1]
        x1 = jnp.clip(x1, 0, w)
        y1 = jnp.clip(y1, 0, h)
        x2 = jnp.clip(x2, 0, w)
        y2 = jnp.clip(y2, 0, h)
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    return boxes.reshape(deltas.shape)


@BBOX_CODERS.register_module()
class DeltaXYWHBBoxCoder:
    """reference: ``mmdet/core/bbox/coder/delta_xywh_bbox_coder.py:1-197``."""

    def __init__(self, target_means=(0., 0., 0., 0.),
                 target_stds=(1., 1., 1., 1.)):
        self.means = tuple(target_means)
        self.stds = tuple(target_stds)

    def encode(self, bboxes, gt_bboxes):
        return bbox2delta(bboxes, gt_bboxes, self.means, self.stds)

    def decode(self, bboxes, pred_bboxes, max_shape=None,
               wh_ratio_clip=16 / 1000):
        return delta2bbox(bboxes, pred_bboxes, self.means, self.stds,
                          max_shape, wh_ratio_clip)


# --------------------------------------------------------------------------
# offset coders (BONAI)
# --------------------------------------------------------------------------

def offset2delta(proposals, gt_offsets, means=(0., 0.), stds=(0.5, 0.5),
                 eps=1e-7):
    """Encode roof→footprint offsets w.r.t. proposal size.

    reference: ``mmdet/core/bbox/coder/delta_xy_offset_coder.py:46-65``:
    ``dx = gx / pw, dy = gy / ph`` then mean/std normalisation.
    """
    pw = jnp.maximum(proposals[..., 2] - proposals[..., 0], eps)
    ph = jnp.maximum(proposals[..., 3] - proposals[..., 1], eps)
    dx = gt_offsets[..., 0] / pw
    dy = gt_offsets[..., 1] / ph
    deltas = jnp.stack([dx, dy], axis=-1)
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def delta2offset(rois, deltas, means=(0., 0.), stds=(0.5, 0.5),
                 max_shape=None):
    """reference: ``mmdet/core/bbox/coder/delta_xy_offset_coder.py:67-88``."""
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    d = deltas * stds + means
    pw = rois[..., 2] - rois[..., 0]
    ph = rois[..., 3] - rois[..., 1]
    gx = pw * d[..., 0]
    gy = ph * d[..., 1]
    if max_shape is not None:
        gx = jnp.clip(gx, -max_shape[1], max_shape[1])
        gy = jnp.clip(gy, -max_shape[0], max_shape[0])
    return jnp.stack([gx, gy], axis=-1)


@BBOX_CODERS.register_module()
class DeltaXYOffsetCoder:
    """reference: ``mmdet/core/bbox/coder/delta_xy_offset_coder.py:19-44``."""

    def __init__(self, target_means=(0., 0.), target_stds=(0.5, 0.5)):
        self.means = tuple(target_means)
        self.stds = tuple(target_stds)

    def encode(self, bboxes, gt_offsets):
        return offset2delta(bboxes, gt_offsets, self.means, self.stds)

    def decode(self, bboxes, pred_offsets, max_shape=None):
        return delta2offset(bboxes, pred_offsets, self.means, self.stds,
                            max_shape)


@BBOX_CODERS.register_module()
class DeltaPolarOffsetCoder:
    """Polar-coordinate offset coder.

    reference: ``mmdet/core/bbox/coder/delta_polar_offset_coder.py:18-98`` —
    length normalised by the proposal diagonal, angle passed through raw.
    """

    def __init__(self, target_means=(0., 0.), target_stds=(0.5, 0.5)):
        self.means = tuple(target_means)
        self.stds = tuple(target_stds)

    def encode(self, bboxes, gt_offsets, eps=1e-7):
        pw = bboxes[..., 2] - bboxes[..., 0]
        ph = bboxes[..., 3] - bboxes[..., 1]
        diag = jnp.sqrt(pw * pw + ph * ph)
        length = gt_offsets[..., 0] / jnp.maximum(diag, eps)
        angle = gt_offsets[..., 1]
        deltas = jnp.stack([length, angle], axis=-1)
        means = jnp.asarray(self.means, deltas.dtype)
        stds = jnp.asarray(self.stds, deltas.dtype)
        return (deltas - means) / stds

    def decode(self, bboxes, pred_offsets, max_shape=None):
        means = jnp.asarray(self.means, pred_offsets.dtype)
        stds = jnp.asarray(self.stds, pred_offsets.dtype)
        d = pred_offsets * stds + means
        pw = bboxes[..., 2] - bboxes[..., 0]
        ph = bboxes[..., 3] - bboxes[..., 1]
        diag = jnp.sqrt(pw * pw + ph * ph)
        length = d[..., 0] * diag
        angle = d[..., 1]
        if max_shape is not None:
            length = jnp.clip(length, 0, float(np.hypot(*max_shape)))
        return jnp.stack([length, angle], axis=-1)


@BBOX_CODERS.register_module()
class DeltaRBBoxCoder:
    """Rotated-box delta coder for the rotated-anchor experiments
    (reference: ``mmdet/core/bbox/coder/delta_rbbox_coder.py``).
    Boxes are ``(xc, yc, w, h, θ)``; deltas
    ``(dx, dy, log dw, log dh, dθ)`` in the proposal's rotated frame.
    """

    def __init__(self, target_means=(0., 0., 0., 0., 0.),
                 target_stds=(1., 1., 1., 1., 1.)):
        self.means = tuple(target_means)
        self.stds = tuple(target_stds)

    def encode(self, proposals, gt, eps=1e-7):
        pxc, pyc = proposals[..., 0], proposals[..., 1]
        pw = jnp.maximum(proposals[..., 2], eps)
        ph = jnp.maximum(proposals[..., 3], eps)
        pt = proposals[..., 4]
        cos_t, sin_t = jnp.cos(pt), jnp.sin(pt)
        ddx = gt[..., 0] - pxc
        ddy = gt[..., 1] - pyc
        # project the centre offset into the proposal frame
        dx = (cos_t * ddx + sin_t * ddy) / pw
        dy = (-sin_t * ddx + cos_t * ddy) / ph
        dw = jnp.log(jnp.maximum(gt[..., 2], eps) / pw)
        dh = jnp.log(jnp.maximum(gt[..., 3], eps) / ph)
        dt = gt[..., 4] - pt
        deltas = jnp.stack([dx, dy, dw, dh, dt], axis=-1)
        means = jnp.asarray(self.means, deltas.dtype)
        stds = jnp.asarray(self.stds, deltas.dtype)
        return (deltas - means) / stds

    def decode(self, proposals, deltas, wh_ratio_clip=16 / 1000):
        means = jnp.asarray(self.means, deltas.dtype)
        stds = jnp.asarray(self.stds, deltas.dtype)
        d = deltas * stds + means
        max_ratio = abs(math.log(wh_ratio_clip))
        dw = jnp.clip(d[..., 2], -max_ratio, max_ratio)
        dh = jnp.clip(d[..., 3], -max_ratio, max_ratio)
        pxc, pyc = proposals[..., 0], proposals[..., 1]
        pw, ph, pt = proposals[..., 2], proposals[..., 3], proposals[..., 4]
        cos_t, sin_t = jnp.cos(pt), jnp.sin(pt)
        gx = pxc + pw * d[..., 0] * cos_t - ph * d[..., 1] * sin_t
        gy = pyc + pw * d[..., 0] * sin_t + ph * d[..., 1] * cos_t
        gw = pw * jnp.exp(dw)
        gh = ph * jnp.exp(dh)
        gt_ = pt + d[..., 4]
        return jnp.stack([gx, gy, gw, gh, gt_], axis=-1)


# --------------------------------------------------------------------------
# misc transforms
# --------------------------------------------------------------------------

def bbox_flip(bboxes, img_shape, direction="horizontal"):
    """Flip boxes; ``img_shape`` is (h, w).

    reference: ``mmdet/core/bbox/transforms.py`` (v2.3 flips without the
    legacy -1 pixel offset).
    """
    h, w = img_shape[0], img_shape[1]
    x1, y1, x2, y2 = (bboxes[..., 0], bboxes[..., 1],
                      bboxes[..., 2], bboxes[..., 3])
    if direction == "horizontal":
        return jnp.stack([w - x2, y1, w - x1, y2], axis=-1)
    if direction == "vertical":
        return jnp.stack([x1, h - y2, x2, h - y1], axis=-1)
    raise ValueError(direction)


def clip_boxes(bboxes, img_shape):
    """Clip to image; ``img_shape`` = (h, w) — may be traced per-image."""
    h, w = img_shape[0], img_shape[1]
    x1 = jnp.clip(bboxes[..., 0], 0, w)
    y1 = jnp.clip(bboxes[..., 1], 0, h)
    x2 = jnp.clip(bboxes[..., 2], 0, w)
    y2 = jnp.clip(bboxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def offset_rotate(offsets, angle_deg):
    """Rotate offset vectors counterclockwise by ``angle_deg``.

    Matches ``LOFT.offset_rotate`` (reference:
    ``mmdet/models/detectors/loft.py:138-145`` /
    ``offset_head_expand_feature.py:239-258``): xy → (len, θ) →
    θ - angle → xy.  For the FOA k·90° case this is an exact rotation.
    """
    a = math.radians(angle_deg)
    c, s = math.cos(a), math.sin(a)
    x = offsets[..., 0]
    y = offsets[..., 1]
    # θ' = θ - a  ⇒  (x', y') = (x cos a + y sin a, -x sin a + y cos a)
    xr = x * c + y * s
    yr = -x * s + y * c
    return jnp.stack([xr, yr], axis=-1)
