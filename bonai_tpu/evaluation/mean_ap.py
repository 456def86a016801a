"""VOC-style mAP and proposal recall (numpy).

reference: ``mmdet/core/evaluation/mean_ap.py:267-392`` (``eval_map``) and
``mmdet/core/evaluation/recall.py`` (``eval_recalls``).
"""

from __future__ import annotations

import numpy as np

from .coco_eval import _bbox_iou_np


def _tpfp_default(dets, gts, iou_thr=0.5):
    """Greedy score-ordered TP/FP marking for one image+class."""
    n = dets.shape[0]
    tp = np.zeros(n)
    fp = np.zeros(n)
    if gts.shape[0] == 0:
        fp[:] = 1
        return tp, fp
    ious = _bbox_iou_np(dets[:, :4], gts)
    taken = np.zeros(gts.shape[0], bool)
    order = np.argsort(-dets[:, 4], kind="stable")
    for i in order:
        best = -1
        best_iou = iou_thr
        for g in range(gts.shape[0]):
            if not taken[g] and ious[i, g] >= best_iou:
                best_iou = ious[i, g]
                best = g
        if best >= 0:
            taken[best] = True
            tp[i] = 1
        else:
            fp[i] = 1
    return tp, fp


def average_precision(recalls, precisions, mode="area"):
    """reference: ``mean_ap.py`` average_precision."""
    recalls = np.concatenate([[0.0], recalls, [1.0]])
    precisions = np.concatenate([[0.0], precisions, [0.0]])
    for i in range(len(precisions) - 1, 0, -1):
        precisions[i - 1] = max(precisions[i - 1], precisions[i])
    if mode == "area":
        idx = np.where(recalls[1:] != recalls[:-1])[0]
        return float(np.sum(
            (recalls[idx + 1] - recalls[idx]) * precisions[idx + 1]))
    # 11-point
    ap = 0.0
    for t in np.arange(0, 1.1, 0.1):
        mask = recalls >= t
        ap += (precisions[mask].max() if mask.any() else 0.0) / 11
    return float(ap)


def eval_map(det_results, annotations, iou_thr=0.5):
    """VOC-style mAP.

    Args:
      det_results: per-image list of per-class (n, 5) arrays.
      annotations: per-image dicts with 'bboxes' (m, 4), 'labels' (m,).
    Returns (mAP, per-class list of dicts).
    """
    num_classes = len(det_results[0])
    eval_results = []
    for c in range(num_classes):
        tps, fps, scores = [], [], []
        num_gts = 0
        for dets, ann in zip(det_results, annotations):
            cls_dets = np.asarray(dets[c], np.float32).reshape(-1, 5)
            gt = ann["bboxes"][ann["labels"] == c]
            num_gts += len(gt)
            tp, fp = _tpfp_default(cls_dets, gt, iou_thr)
            tps.append(tp)
            fps.append(fp)
            scores.append(cls_dets[:, 4])
        scores = np.concatenate(scores) if scores else np.zeros(0)
        order = np.argsort(-scores, kind="stable")
        tp = np.concatenate(tps)[order] if len(scores) else np.zeros(0)
        fp = np.concatenate(fps)[order] if len(scores) else np.zeros(0)
        tp_cum = np.cumsum(tp)
        fp_cum = np.cumsum(fp)
        recalls = tp_cum / max(num_gts, 1)
        precisions = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
        ap = average_precision(recalls, precisions) if num_gts else 0.0
        eval_results.append(dict(
            num_gts=num_gts, num_dets=len(scores), ap=ap,
            recall=float(recalls[-1]) if len(recalls) else 0.0))
    aps = [r["ap"] for r in eval_results if r["num_gts"] > 0]
    return (float(np.mean(aps)) if aps else 0.0), eval_results


def eval_recalls(gts, proposals, proposal_nums=(100, 300, 1000),
                 iou_thrs=(0.5,)):
    """Proposal recall matrix (reference ``recall.py``).

    Args:
      gts: per-image (m, 4) arrays.
      proposals: per-image (n, 4) or (n, 5 score-sorted) arrays.
    Returns (len(proposal_nums), len(iou_thrs)) recall matrix.
    """
    out = np.zeros((len(proposal_nums), len(iou_thrs)))
    total_gts = sum(len(g) for g in gts)
    if total_gts == 0:
        return out
    for ti, thr in enumerate(iou_thrs):
        for ni, num in enumerate(proposal_nums):
            hit = 0
            for gt, props in zip(gts, proposals):
                if len(gt) == 0:
                    continue
                p = np.asarray(props, np.float32)
                if p.shape[1] == 5:
                    p = p[np.argsort(-p[:, 4])][:, :4]
                p = p[:num]
                if len(p) == 0:
                    continue
                ious = _bbox_iou_np(gt, p)
                hit += int((ious.max(axis=1) >= thr).sum())
            out[ni, ti] = hit / total_gts
    return out
