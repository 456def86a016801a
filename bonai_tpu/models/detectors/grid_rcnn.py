"""Grid R-CNN detector (reference ``mmdet/models/detectors/
grid_rcnn.py`` + ``roi_heads/grid_roi_head.py``): classification from
the standard bbox branch, localisation replaced at test time by
grid-point heatmap voting."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..roi_heads.grid_head import (GridHead, grid_decode_boxes,
                                   grid_targets, jitter_boxes)
from .two_stage import TwoStageDetector, boxes_to_rois


class GridRCNN(TwoStageDetector):

    def _setup_roi_head(self, dt):
        super()._setup_roi_head(dt)
        cfg = dict(self.roi_head)
        gh = dict(cfg.get("grid_head") or {})
        self.grid_extractor_cfg = dict(
            cfg.get("grid_roi_extractor") or cfg["bbox_roi_extractor"])
        self.grid_head_m = GridHead(
            grid_points=gh.get("grid_points", 9),
            num_convs=gh.get("num_convs", 8),
            roi_feat_size=gh.get("roi_feat_size", 14),
            in_channels=gh.get("in_channels", 256),
            point_feat_channels=gh.get("point_feat_channels", 64),
            dtype=dt, name="grid_head")
        self.grid_loss_weight = dict(gh.get("loss_grid", {})).get(
            "loss_weight", 15.0)

    def _dummy_extra_heads(self, feats, rois):
        """init-path hook: touch the grid head (only used inside
        forward_train / _extra_simple_test otherwise)."""
        gf = self._roi_align_cfg(self.grid_extractor_cfg, feats, rois,
                                 None)
        return [self.grid_head_m(gf, train=True)]

    def _extra_forward_train(self, feats, batch, rcnn, pos_boxes,
                             pos_is_pos, pos_gt, flat_pack=None):
        losses = dict(super()._extra_forward_train(
            feats, batch, rcnn, pos_boxes, pos_is_pos, pos_gt, flat_pack))
        b, p = pos_boxes.shape[:2]
        gt_bboxes = batch["gt_bboxes"]
        # random jitter of positive proposals (reference _random_jitter)
        rng = self.make_rng("sampling")
        img_shape = batch.get("img_shape")
        jit = jax.vmap(lambda r, bx, sh: jitter_boxes(r, bx, sh))(
            jax.random.split(rng, b), pos_boxes,
            img_shape if img_shape is not None
            else jnp.full((b, 2), 1e9))
        rois, roi_valid = boxes_to_rois(jit, pos_is_pos)
        gfeats = self._roi_align_cfg(self.grid_extractor_cfg, feats, rois,
                                     roi_valid, flat_pack=flat_pack)
        pred = self.grid_head_m(gfeats, train=True)
        bidx = jnp.arange(b)[:, None]
        matched = gt_bboxes[bidx, pos_gt].reshape(b * p, 4)
        tgt = grid_targets(jit.reshape(b * p, 4), matched,
                           self.grid_head_m.grid_points,
                           self.grid_head_m.whole_map_size,
                           pos_radius=rcnn.get("pos_radius", 1))
        # targets are (N, G, half, half); preds (N, half, half, G)
        tgt = jnp.transpose(tgt, (0, 2, 3, 1))
        w = roi_valid.astype(jnp.float32)[:, None, None, None]
        denom = jnp.maximum(jnp.sum(w) * tgt.shape[1] * tgt.shape[2]
                            * tgt.shape[3], 1.0)

        def bce(logits):
            z = jnp.clip(logits, -30, 30)
            l = jnp.maximum(z, 0) - z * tgt + jnp.log1p(jnp.exp(-jnp.abs(z)))
            return jnp.sum(l * w) / denom

        losses["loss_grid"] = self.grid_loss_weight * (
            bce(pred["fused"]) + bce(pred["unfused"]))
        return losses

    def _extra_simple_test(self, feats, det_boxes, det_valid, img_shape,
                           scale_factor, flat_pack=None):
        out = dict(super()._extra_simple_test(
            feats, det_boxes, det_valid, img_shape, scale_factor,
            flat_pack))
        b, m = det_boxes.shape[:2]
        rois, roi_valid = boxes_to_rois(det_boxes, det_valid)
        gfeats = self._roi_align_cfg(self.grid_extractor_cfg, feats, rois,
                                     roi_valid, flat_pack=flat_pack)
        pred = self.grid_head_m(gfeats, train=False)["fused"]
        adj = jax.vmap(
            lambda bx, hm, sh: grid_decode_boxes(
                bx, hm, self.grid_head_m.grid_points,
                self.grid_head_m.whole_map_size, sh)
        )(det_boxes, pred.reshape(b, m, *pred.shape[1:]),
          jnp.asarray(img_shape))
        # keep original boxes for padded slots; rescale like the caller
        adj = jnp.where(det_valid[..., None], adj, det_boxes)
        out["det_bboxes"] = adj / jnp.asarray(scale_factor)[:, None, None]
        return out
