"""PointRend detector (reference ``mmdet/models/detectors/point_rend.py``
+ ``roi_heads/point_rend_roi_head.py``): Mask R-CNN whose mask branch is
a coarse 7x7 FC head refined by an uncertainty-driven point MLP, with
iterative subdivision upsampling at test time."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..roi_heads.point_head import (MaskPointHead, fine_grained_point_feats,
                                    point_targets_from_instance_masks,
                                    uncertainty_points_test,
                                    uncertainty_points_train)
from ..losses import binary_cross_entropy
from .two_stage import TwoStageDetector, boxes_to_rois


class PointRend(TwoStageDetector):

    def _setup_roi_head(self, dt):
        super()._setup_roi_head(dt)
        cfg = dict(self.roi_head)
        ph = dict(cfg.get("point_head") or {})
        self.point_head_m = MaskPointHead(
            num_fcs=ph.get("num_fcs", 3),
            in_channels=ph.get("in_channels", 256),
            fc_channels=ph.get("fc_channels", 256),
            num_classes=ph.get("num_classes", 1),
            coarse_pred_each_layer=ph.get("coarse_pred_each_layer", True),
            dtype=dt, name="point_head")
        self.point_loss_weight = dict(ph.get("loss_point", {})).get(
            "loss_weight", 1.0)
        # fine-grained features come from the mask extractor's (single)
        # finest level (reference config: GenericRoIExtractor strides=[4])
        self.point_stride = list(self.mask_extractor_cfg.get(
            "featmap_strides", [4]))[0]

    def _dummy_extra_heads(self, feats, rois):
        """init-path hook: touch the point head so ``model.init`` (via
        forward_dummy, reference ``two_stage.py:87-103``) creates its
        params — it otherwise only runs inside forward_train."""
        mf = self._roi_align_cfg(self.mask_extractor_cfg, feats, rois,
                                 None)
        coarse = self.mask_head_m(mf)
        rel = jnp.full((rois.shape[0], 4, 2), 0.5)
        fine = fine_grained_point_feats(feats[0], rois, rel,
                                        self.point_stride)
        cp = self._point_coarse_sample(coarse, rel)
        return [self.point_head_m(fine, cp)]

    def _point_coarse_sample(self, coarse_logits, rel_pts):
        """Sample per-class coarse logits at rel-RoI points -> (N, P, C)."""
        from ..roi_heads.point_head import bilinear_point_sample
        n, h, w, c = coarse_logits.shape
        return jax.vmap(lambda m, p: bilinear_point_sample(
            m, jnp.stack([p[:, 0] * w - 0.5, p[:, 1] * h - 0.5], -1)))(
            coarse_logits, rel_pts)

    def _mask_forward_train(self, feats, batch, rcnn, pos_boxes, pos_is_pos,
                            pos_gt, flat_pack=None):
        losses = super()._mask_forward_train(
            feats, batch, rcnn, pos_boxes, pos_is_pos, pos_gt, flat_pack)
        b, p = pos_boxes.shape[:2]
        gt_bboxes = batch["gt_bboxes"]
        gt_masks = batch["gt_masks"]
        rois, roi_valid = boxes_to_rois(pos_boxes, pos_is_pos)
        # recompute coarse logits (cheap: 7x7 FC head on stride-4 feats);
        # keeps the base-class contract untouched
        mask_feats = self._roi_align_cfg(self.mask_extractor_cfg, feats,
                                         rois, roi_valid,
                                         flat_pack=flat_pack)
        coarse = self.mask_head_m(mask_feats)            # (N, 7, 7, C)
        rel_pts = uncertainty_points_train(
            self.make_rng("sampling"),
            jax.lax.stop_gradient(coarse[..., 0]),
            num_points=rcnn.get("num_points", 196),
            oversample_ratio=rcnn.get("oversample_ratio", 3),
            importance_sample_ratio=rcnn.get("importance_sample_ratio",
                                             0.75))
        fine = fine_grained_point_feats(feats[0], rois, rel_pts,
                                        self.point_stride)
        coarse_pt = self._point_coarse_sample(coarse, rel_pts)
        point_logits = self.point_head_m(fine, coarse_pt)[..., 0]
        bidx = jnp.arange(b)[:, None]
        matched_boxes = gt_bboxes[bidx, pos_gt].reshape(b * p, 4)
        matched_masks = gt_masks[bidx, pos_gt].reshape(
            b * p, *gt_masks.shape[-2:])
        tgt = point_targets_from_instance_masks(rois, rel_pts,
                                                matched_boxes, matched_masks)
        tgt = (tgt >= 0.5).astype(jnp.float32)
        w = roi_valid.astype(jnp.float32)[:, None]
        losses["loss_point"] = self.point_loss_weight * binary_cross_entropy(
            point_logits, tgt, jnp.broadcast_to(w, point_logits.shape),
            avg_factor=jnp.maximum(jnp.sum(w) * point_logits.shape[1], 1.0))
        return losses

    def _extra_simple_test(self, feats, det_boxes, det_valid, img_shape,
                           scale_factor, flat_pack=None):
        """Subdivision refinement (reference ``_mask_point_forward_test``):
        upsample 2x per step; re-predict the most uncertain points from
        fine-grained + coarse point features."""
        out = dict(super()._extra_simple_test(
            feats, det_boxes, det_valid, img_shape, scale_factor,
            flat_pack))
        tc = dict(self.test_cfg["rcnn"])
        steps = tc.get("subdivision_steps", 5)
        num_points = tc.get("subdivision_num_points", 784)
        scale = tc.get("scale_factor", 2)
        b, m = det_boxes.shape[:2]
        rois, roi_valid = boxes_to_rois(det_boxes, det_valid)
        mask_feats = self._roi_align_cfg(self.mask_extractor_cfg, feats,
                                         rois, roi_valid,
                                         flat_pack=flat_pack)
        coarse = self.mask_head_m(mask_feats)            # (N, s, s, C)
        refined = coarse[..., 0]                         # (N, h, w)
        n = refined.shape[0]
        for step in range(steps):
            h, w = refined.shape[1] * scale, refined.shape[2] * scale
            refined = jax.image.resize(refined, (n, h, w), "linear")
            if (num_points >= h * w) and step < steps - 1:
                continue
            idx, rel_pts = uncertainty_points_test(refined, num_points)
            fine = fine_grained_point_feats(feats[0], rois, rel_pts,
                                            self.point_stride)
            coarse_pt = self._point_coarse_sample(coarse, rel_pts)
            logits = self.point_head_m(fine, coarse_pt)[..., 0]  # (N, K)
            flat = refined.reshape(n, h * w)
            flat = flat.at[jnp.arange(n)[:, None], idx].set(logits)
            refined = flat.reshape(n, h, w)
        out["mask_probs"] = jax.nn.sigmoid(refined).reshape(
            b, m, *refined.shape[1:])
        return out
