"""FreeAnchor: learning-to-match loss on the RetinaNet head.

reference: ``mmdet/models/dense_heads/free_anchor_retina_head.py``
(arXiv 1909.02466).  The head/anchors are exactly RetinaNet's; only the
loss changes — positive "bag" loss (mean-max over each gt's top-k IoU
anchors of cls-prob x box-prob) and a negative loss focal-weighted by
P(anchor -> some object).  The reference's per-image python loop +
sparse-tensor gymnastics become batched dense ops over padded gts
(C is small; the (G, A) IoU matrices are already materialised by every
other head here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.boxes import delta2bbox, bbox_overlaps
from ..losses import smooth_l1_loss


def free_anchor_loss(cls_scores, bbox_preds, anchors_flat, gt_bboxes,
                     gt_valid, gt_labels, num_classes,
                     target_means=(0.,) * 4,
                     target_stds=(1.0, 1.0, 1.0, 1.0),
                     pre_anchor_topk=50, bbox_thr=0.6, gamma=2.0,
                     alpha=0.5, bbox_beta=0.11, loss_bbox_weight=0.75):
    """Batched FreeAnchor loss (reference ``free_anchor_retina_head.py:
    49-214``).  Padded gts are masked out of both bags and box_prob."""
    b = cls_scores[0].shape[0]
    na = anchors_flat.shape[0]
    cls_flat = jnp.concatenate(
        [c.reshape(b, -1, num_classes) for c in cls_scores], 1)
    reg_flat = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in bbox_preds], 1)
    cls_prob = jax.nn.sigmoid(cls_flat)                    # (B, A, C)

    def encode(anchor, gt):
        ax = (anchor[..., 0] + anchor[..., 2]) * 0.5
        ay = (anchor[..., 1] + anchor[..., 3]) * 0.5
        aw = jnp.maximum(anchor[..., 2] - anchor[..., 0], 1e-6)
        ah = jnp.maximum(anchor[..., 3] - anchor[..., 1], 1e-6)
        gx = (gt[..., 0] + gt[..., 2]) * 0.5
        gy = (gt[..., 1] + gt[..., 3]) * 0.5
        gw = jnp.maximum(gt[..., 2] - gt[..., 0], 1e-6)
        gh = jnp.maximum(gt[..., 3] - gt[..., 1], 1e-6)
        d = jnp.stack([(gx - ax) / aw, (gy - ay) / ah,
                       jnp.log(gw / aw), jnp.log(gh / ah)], -1)
        means = jnp.asarray(target_means)
        stds = jnp.asarray(target_stds)
        return (d - means) / stds

    def one_image(cls_p, reg_p, gb, gv, gl):
        # ---- negative path: P{a_j in A+} (no gradient) ----
        pred_boxes = delta2bbox(anchors_flat, reg_p, target_means,
                                target_stds)
        iou = bbox_overlaps(gb, pred_boxes)                # (G, A)
        iou = jnp.where(gv[:, None], iou, 0.0)
        t1 = bbox_thr
        t2 = jnp.clip(jnp.max(iou, axis=1, keepdims=True), t1 + 1e-12)
        obj_box_prob = jnp.clip((iou - t1) / (t2 - t1), 0.0, 1.0)
        obj_box_prob = jnp.where(gv[:, None], obj_box_prob, 0.0)
        # image_box_prob[j, c] = max over gts of class c
        cls_eq = jax.nn.one_hot(gl, num_classes, dtype=jnp.float32)
        image_box_prob = jnp.max(
            obj_box_prob[:, :, None] * cls_eq[:, None, :], axis=0)  # (A, C)
        image_box_prob = jax.lax.stop_gradient(image_box_prob)

        # ---- positive bags: top-k anchors by anchor-gt IoU ----
        anchor_iou = bbox_overlaps(gb, anchors_flat)       # (G, A)
        k = min(pre_anchor_topk, na)
        _, matched = jax.lax.top_k(anchor_iou, k)          # (G, K)
        m_anchors = anchors_flat[matched]                  # (G, K, 4)
        m_cls = jnp.take_along_axis(
            cls_p[matched],                                # (G, K, C)
            gl[:, None, None].astype(jnp.int32), axis=2)[..., 0]
        m_targets = encode(m_anchors, gb[:, None, :])
        lb = loss_bbox_weight * jnp.sum(smooth_l1_loss(
            reg_p[matched], m_targets, bbox_beta,
            jnp.ones_like(m_targets), reduction="none"), -1)
        m_box_prob = jnp.exp(-lb)                          # (G, K)

        matched_prob = m_cls * m_box_prob
        wgt = 1.0 / jnp.clip(1.0 - matched_prob, 1e-12)
        wgt = wgt / jnp.sum(wgt, axis=1, keepdims=True)
        bag_prob = jnp.sum(wgt * matched_prob, axis=1)     # (G,)
        pos_loss = alpha * -jnp.log(jnp.clip(bag_prob, 1e-12, 1.0))
        pos_loss = jnp.where(gv, pos_loss, 0.0)

        # ---- negative loss ----
        prob = cls_p * (1.0 - image_box_prob)
        neg = (1 - alpha) * prob ** gamma * \
            -jnp.log(jnp.clip(1.0 - prob, 1e-12, 1.0))
        return jnp.sum(pos_loss), jnp.sum(neg), jnp.sum(gv)

    pos_l, neg_l, npos = jax.vmap(one_image)(
        cls_prob, reg_flat, gt_bboxes, gt_valid, gt_labels)
    num_pos = jnp.maximum(jnp.sum(npos), 1.0)
    return {
        "positive_bag_loss": jnp.sum(pos_l) / num_pos,
        "negative_bag_loss": jnp.sum(neg_l)
        / (num_pos * pre_anchor_topk),
    }
