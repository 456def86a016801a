"""NMS / soft-NMS as bounded-loop XLA programs.

The reference calls mmcv's CUDA ``nms`` / ``soft_nms`` kernels
(reference: ``mmdet/ops/__init__.py:5-17``,
``mmdet/core/post_processing/bbox_nms.py:5-69``,
``mmdet/models/dense_heads/rpn_head.py:79-168``).  On TPU, sequential
suppression is reformulated as:

- **hard NMS**: blocked greedy suppression — process score-sorted boxes in
  tiles; each tile is suppressed by previously-kept boxes (one matrix op),
  then an in-tile fixpoint iteration reproduces the sequential greedy result
  exactly.  Sequential steps: O(N/T + fixpoint iters), not O(N).
- **soft-NMS**: a ``fori_loop`` over output slots (pick argmax, decay
  neighbours) — exact linear/gaussian soft-NMS semantics.

All shapes are static; padded inputs must carry ``score = -inf`` (or a
``valid`` mask which we fold into the scores).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .boxes import bbox_overlaps

NEG_INF = -1e10


def _pad_to_multiple(x, multiple, axis, value):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def nms(boxes, scores, iou_threshold, valid=None, tile_size=256):
    """Greedy hard NMS.  Returns a bool keep-mask aligned with the inputs.

    Exactly reproduces sequential greedy suppression order (descending
    scores).  ``valid=False`` entries are never kept and never suppress.
    """
    n = boxes.shape[0]
    if valid is not None:
        scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-scores)
    sboxes = boxes[order]
    sscores = scores[order]

    sboxes = _pad_to_multiple(sboxes, tile_size, 0, 0.0)
    sscores = _pad_to_multiple(sscores, tile_size, 0, NEG_INF)
    np_ = sboxes.shape[0]
    num_tiles = np_ // tile_size
    alive_valid = sscores > NEG_INF / 2

    col_ids = jnp.arange(np_)

    def tile_body(i, keep):
        start = i * tile_size
        tile = jax.lax.dynamic_slice(sboxes, (start, 0), (tile_size, 4))
        tile_valid = jax.lax.dynamic_slice(alive_valid, (start,), (tile_size,))
        iou_all = bbox_overlaps(tile, sboxes)               # (T, P)
        # suppression by kept boxes in strictly earlier positions
        prev_mask = (col_ids[None, :] < start) & keep[None, :]
        supp_ext = jnp.any((iou_all > iou_threshold) & prev_mask, axis=1)
        alive0 = tile_valid & ~supp_ext

        # in-tile greedy fixpoint
        iou_self = jax.lax.dynamic_slice(iou_all, (0, start),
                                         (tile_size, tile_size))
        tri = (jnp.arange(tile_size)[:, None]
               < jnp.arange(tile_size)[None, :])       # j suppresses k>j
        supp_mat = (iou_self > iou_threshold) & tri

        def fix_cond(carry):
            alive, changed, it = carry
            return changed & (it < tile_size)

        def fix_body(carry):
            alive, _, it = carry
            suppressed = jnp.any(supp_mat & alive[:, None], axis=0)
            alive_new = alive0 & ~suppressed
            return alive_new, jnp.any(alive_new != alive), it + 1

        alive, _, _ = jax.lax.while_loop(
            fix_cond, fix_body, (alive0, jnp.bool_(True), 0))
        return jax.lax.dynamic_update_slice(keep, alive, (start,))

    keep_sorted = jax.lax.fori_loop(
        0, num_tiles, tile_body, jnp.zeros(np_, bool))
    keep_sorted = keep_sorted[:n]
    # scatter back to original order
    keep = jnp.zeros(n, bool).at[order].set(keep_sorted)
    return keep


def soft_nms(boxes, scores, iou_threshold=0.3, sigma=0.5, min_score=1e-3,
             method="linear", max_out=None, valid=None):
    """Soft-NMS (reference: mmcv 1.0.5 ``soft_nms``; RCNN test cfg uses
    ``dict(type='soft_nms', iou_threshold=0.5)`` —
    ``configs/_base_/models/bonai_loft_foa_r50_fpn_basic.py:138``).

    Returns ``(new_scores, keep_rank)`` where ``new_scores`` are decayed
    scores for selected boxes (0 for dropped/padded) in input order and
    ``keep_rank`` is the selection order (-1 for unselected).
    """
    n = boxes.shape[0]
    if max_out is None:
        max_out = n
    if valid is not None:
        scores = jnp.where(valid, scores, 0.0)
    # iou matrix once: O(N^2) memory; callers keep N <= ~4k
    iou = bbox_overlaps(boxes, boxes)

    def cond(carry):
        cur_scores, _, _, t = carry
        # early exit: the sequential chain stops as soon as no score
        # survives min_score — on real imagery that is the number of
        # actual detections (~50-300), not the max_out cap (2000 at the
        # BONAI test cfg), cutting eval-time soft-NMS cost ~10x
        return (t < max_out) & (jnp.max(cur_scores) >= min_score)

    def body(carry):
        cur_scores, out_scores, rank, t = carry
        idx = jnp.argmax(cur_scores)
        top = cur_scores[idx]
        out_scores = out_scores.at[idx].set(top)
        rank = rank.at[idx].set(t)
        iou_row = iou[idx]
        if method == "linear":
            decay = jnp.where(iou_row > iou_threshold, 1.0 - iou_row, 1.0)
        elif method == "gaussian":
            decay = jnp.exp(-(iou_row * iou_row) / sigma)
        else:  # 'naive' == hard nms behaviour
            decay = jnp.where(iou_row > iou_threshold, 0.0, 1.0)
        cur_scores = cur_scores * decay
        cur_scores = cur_scores.at[idx].set(0.0)
        cur_scores = jnp.where(cur_scores < min_score, 0.0, cur_scores)
        return cur_scores, out_scores, rank, t + 1

    init = (scores, jnp.zeros_like(scores), jnp.full(n, -1, jnp.int32),
            jnp.int32(0))
    _, out_scores, rank, _ = jax.lax.while_loop(cond, body, init)
    return out_scores, rank


def batched_nms(boxes, scores, idxs, iou_threshold, valid=None,
                tile_size=256):
    """Class/level-offset NMS (reference: mmcv ``batched_nms`` as used by
    ``rpn_head.py`` and ``bbox_nms.py:50-69``): boxes of different ``idxs``
    never suppress each other.  Implemented with the coordinate-offset
    trick, which is pure arithmetic on top of :func:`nms`.
    """
    if boxes.shape[0] == 0:
        return jnp.zeros(0, bool)
    max_coord = jnp.max(boxes) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms(shifted, scores, iou_threshold, valid=valid,
               tile_size=tile_size)


def multiclass_nms(multi_bboxes, multi_scores, score_thr, nms_cfg,
                   max_per_img, valid=None):
    """Per-class thresholded NMS over ``(N, C+1)`` scores (background last).

    reference: ``mmdet/core/post_processing/bbox_nms.py:5-69``.

    Returns fixed-shape ``(max_per_img, 4)`` boxes, ``(max_per_img,)``
    scores, int32 labels and a bool valid mask, sorted by score.
    """
    num_classes = multi_scores.shape[1] - 1
    n = multi_bboxes.shape[0]
    class_agnostic_boxes = multi_bboxes.shape[-1] == 4

    nms_cfg = dict(nms_cfg)
    nms_type = nms_cfg.pop("type", "nms")
    iou_thr = nms_cfg.pop("iou_threshold", nms_cfg.pop("iou_thr", 0.5))

    all_boxes, all_scores, all_labels, all_valid = [], [], [], []
    for c in range(num_classes):
        cls_scores = multi_scores[:, c]
        if class_agnostic_boxes:
            cls_boxes = multi_bboxes
        else:
            cls_boxes = multi_bboxes[:, c * 4:(c + 1) * 4]
        cls_valid = cls_scores > score_thr
        if valid is not None:
            cls_valid = cls_valid & valid
        if nms_type == "soft_nms":
            new_scores, _ = soft_nms(
                cls_boxes, jnp.where(cls_valid, cls_scores, 0.0),
                iou_threshold=iou_thr, max_out=min(n, max_per_img),
                **{k: v for k, v in nms_cfg.items()
                   if k in ("sigma", "min_score", "method")})
            keep = new_scores > 0
            cls_scores = new_scores
        else:
            keep = nms(cls_boxes, cls_scores, iou_thr, valid=cls_valid)
        all_boxes.append(cls_boxes)
        all_scores.append(jnp.where(keep, cls_scores, 0.0))
        all_labels.append(jnp.full(n, c, jnp.int32))
        all_valid.append(keep)

    boxes = jnp.concatenate(all_boxes, axis=0)
    scores = jnp.concatenate(all_scores, axis=0)
    labels = jnp.concatenate(all_labels, axis=0)
    keep = jnp.concatenate(all_valid, axis=0)

    scores = jnp.where(keep, scores, 0.0)
    k = min(max_per_img, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    out_boxes = boxes[top_idx]
    out_labels = labels[top_idx]
    if k < max_per_img:
        pad = max_per_img - k
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        top_scores = jnp.pad(top_scores, (0, pad))
        out_labels = jnp.pad(out_labels, (0, pad))
    return (out_boxes, top_scores, out_labels, top_scores > 0)
