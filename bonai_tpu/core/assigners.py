"""Max-IoU assignment as a batched, masked, static-shape op.

reference: ``mmdet/core/bbox/assigners/max_iou_assigner.py:60-212``.  The
reference loops per image with dynamic numbers of GT boxes and optionally
offloads huge IoU matrices to CPU (``gpu_assign_thr``); here GT is padded to
a fixed capacity with a validity mask and everything is one fused XLA op,
vmap-able over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import bbox_overlaps


def max_iou_assign(boxes, gt_bboxes, gt_valid, pos_iou_thr, neg_iou_thr,
                   min_pos_iou=0., match_low_quality=True,
                   gt_max_assign_all=True, box_valid=None, overlaps=None):
    """Assign each box to {-1: ignore, 0: negative, i+1: matched gt i}.

    Args:
      boxes: ``(N, 4)`` candidate boxes (anchors / proposals), may be padded.
      gt_bboxes: ``(G, 4)`` padded GT boxes.
      gt_valid: ``(G,)`` bool mask of real GT entries.
      box_valid: optional ``(N,)`` bool; invalid boxes are forced to ignore.
      overlaps: optional precomputed ``(N, G)`` IoU matrix.

    Returns:
      assigned_gt_inds: ``(N,)`` int32 (reference encoding).
      max_overlaps: ``(N,)`` IoU with the matched gt.
    """
    if overlaps is None:
        overlaps = bbox_overlaps(boxes, gt_bboxes)
    # mask out padded gt columns so they can never be matched
    overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)

    max_overlaps = jnp.max(overlaps, axis=1)
    argmax_overlaps = jnp.argmax(overlaps, axis=1)

    # start from ignore(-1); below neg thr -> negative(0).  With zero valid
    # gts every anchor has max_overlap = -1 < neg_thr and becomes background,
    # matching the reference's "no truth, assign everything to background".
    assigned = jnp.full(boxes.shape[0], -1, jnp.int32)
    assigned = jnp.where(max_overlaps < neg_iou_thr, 0, assigned)
    # above pos thr -> argmax gt
    assigned = jnp.where(max_overlaps >= pos_iou_thr,
                         argmax_overlaps.astype(jnp.int32) + 1, assigned)

    if match_low_quality:
        # every valid gt claims the boxes tying its max IoU (>= min_pos_iou)
        gt_max = jnp.max(overlaps, axis=0)                      # (G,)
        claim = (overlaps == gt_max[None, :]) & gt_valid[None, :] \
            & (gt_max[None, :] >= min_pos_iou) & (gt_max[None, :] > 0)
        if not gt_max_assign_all:
            gt_argmax = jnp.argmax(overlaps, axis=0)
            row_ids = jnp.arange(boxes.shape[0])[:, None]
            claim = claim & (row_ids == gt_argmax[None, :])
        # later gts overwrite earlier ones (reference loops i = 0..G-1)
        gt_ids = jnp.arange(gt_bboxes.shape[0], dtype=jnp.int32) + 1
        claimed_gt = jnp.max(jnp.where(claim, gt_ids[None, :], 0), axis=1)
        assigned = jnp.where(claimed_gt > 0, claimed_gt, assigned)

    if box_valid is not None:
        assigned = jnp.where(box_valid, assigned, -1)
        max_overlaps = jnp.where(box_valid, max_overlaps, -1.0)
    return assigned, max_overlaps


def atss_assign(anchors, num_level_anchors, gt_bboxes, gt_valid, topk=9,
                overlaps=None):
    """Adaptive Training Sample Selection (ATSS, arXiv 1912.02424).

    reference: ``mmdet/core/bbox/assigners/atss_assigner.py:33-170`` —
    per (gt, level) the ``topk`` center-closest anchors are candidates;
    the IoU threshold adapts per gt to mean+std of candidate IoUs;
    positives must also have their center inside the gt; an anchor
    claimed by several gts keeps the highest-IoU one.

    Static-shape formulation: the per-level top-k becomes one
    ``lax.top_k`` per level over the (G, n_level) distance block; all
    masking is dense (A, G) boolean algebra, padded gts can never win.

    Args:
      anchors: ``(A, 4)``; num_level_anchors: static per-level counts.
      gt_bboxes ``(G, 4)``, gt_valid ``(G,)``.
    Returns assigned ``(A,)`` int32 (0 = bg, i+1 = gt i) and
    ``max_overlaps`` ``(A,)``.
    """
    a = anchors.shape[0]
    g = gt_bboxes.shape[0]
    if overlaps is None:
        overlaps = bbox_overlaps(anchors, gt_bboxes)        # (A, G)
    overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)

    acx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    acy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    gcx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) * 0.5
    gcy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) * 0.5
    dist = jnp.sqrt((acx[:, None] - gcx[None, :]) ** 2
                    + (acy[:, None] - gcy[None, :]) ** 2)   # (A, G)

    cand = jnp.zeros((a, g), bool)
    start = 0
    garange = jnp.arange(g)[:, None]
    for n in num_level_anchors:
        k = min(int(topk), int(n))
        d_lvl = dist[start:start + n].T                     # (G, n)
        _, idx = jax.lax.top_k(-d_lvl, k)                   # (G, k)
        lvl_mask = jnp.zeros((g, n), bool).at[garange, idx].set(True)
        cand = cand.at[start:start + n].set(lvl_mask.T)
        start += n
    cand = cand & gt_valid[None, :]

    k_eff = jnp.maximum(jnp.sum(cand, axis=0).astype(jnp.float32), 1.0)
    co = jnp.where(cand, overlaps, 0.0)
    mean = jnp.sum(co, axis=0) / k_eff
    var = jnp.sum(jnp.where(cand, (overlaps - mean[None, :]) ** 2, 0.0),
                  axis=0) / jnp.maximum(k_eff - 1.0, 1.0)   # torch ddof=1
    thr = mean + jnp.sqrt(var)                              # (G,)

    inside = jnp.minimum(
        jnp.minimum(acx[:, None] - gt_bboxes[None, :, 0],
                    gt_bboxes[None, :, 2] - acx[:, None]),
        jnp.minimum(acy[:, None] - gt_bboxes[None, :, 1],
                    gt_bboxes[None, :, 3] - acy[:, None])) > 0.01
    is_pos = cand & (overlaps >= thr[None, :]) & inside

    ov_masked = jnp.where(is_pos, overlaps, -1e8)
    max_ov = jnp.max(ov_masked, axis=1)
    arg = jnp.argmax(ov_masked, axis=1)
    assigned = jnp.where(max_ov > -1e7, arg.astype(jnp.int32) + 1, 0)
    return assigned, jnp.where(assigned > 0, max_ov, 0.0)
