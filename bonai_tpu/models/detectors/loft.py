"""LOFT detector — Mask R-CNN + roof→footprint offset branch (FOA).

reference: ``mmdet/models/detectors/loft.py:11-145``,
``mmdet/models/roi_heads/loft_roi_head.py:22-227``,
``mmdet/models/roi_heads/attribute_heads/offset_head_expand_feature.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.boxes import delta2offset
from ..losses import smooth_l1_loss, mse_loss
from ..roi_heads.offset_heads import (OffsetHead, OffsetHeadExpandFeature,
                                      foa_offset_fusion, foa_offset_targets)
from .two_stage import TwoStageDetector, _dtype, boxes_to_rois


class LOFT(TwoStageDetector):
    """TwoStageDetector + offset RoI branch (``LoftRoIHead`` semantics)."""

    def _setup_roi_head(self, dt):
        super()._setup_roi_head(dt)
        cfg = dict(self.roi_head)
        oh = dict(cfg["offset_head"])
        oh_type = oh.pop("type", "OffsetHeadExpandFeature")
        loss_cfg = dict(oh.pop("loss_offset",
                               dict(type="SmoothL1Loss", loss_weight=1.0)))
        self.offset_loss_type = loss_cfg.get("type", "SmoothL1Loss")
        self.offset_loss_weight = loss_cfg.get("loss_weight", 1.0)
        self.offset_loss_beta = loss_cfg.get("beta", 1.0)
        coder_cfg = dict(oh.pop("offset_coder", dict(
            type="DeltaXYOffsetCoder", target_means=[0.0, 0.0],
            target_stds=[0.5, 0.5])))
        self.offset_coder_means = tuple(coder_cfg.get("target_means", (0., 0.)))
        self.offset_coder_stds = tuple(coder_cfg.get("target_stds", (.5, .5)))
        common = dict(
            roi_feat_size=oh.get("roi_feat_size", 7),
            in_channels=oh.get("in_channels", 256),
            num_convs=oh.get("num_convs", 4),
            num_fcs=oh.get("num_fcs", 2),
            reg_num=oh.get("reg_num", 2),
            conv_out_channels=oh.get("conv_out_channels", 256),
            fc_out_channels=oh.get("fc_out_channels", 1024),
            dtype=dt, name="offset_head")
        if oh_type == "OffsetHeadExpandFeature":
            self.offset_head_m = OffsetHeadExpandFeature(
                expand_feature_num=oh.get("expand_feature_num", 4),
                share_expand_fc=oh.get("share_expand_fc", False),
                rotations=tuple(oh.get("rotations", (0, 90, 180, 270))),
                offset_coordinate=oh.get("offset_coordinate", "rectangle"),
                **common)
            self.foa = True
        else:
            self.offset_head_m = OffsetHead(**common)
            self.foa = False
        self.offset_extractor_cfg = dict(cfg["offset_roi_extractor"])

    def _offset_loss(self, pred, target, weight):
        if self.offset_loss_type == "SmoothL1Loss":
            loss = smooth_l1_loss(pred, target, self.offset_loss_beta,
                                  weight)
        else:
            loss = mse_loss(pred, target, weight)
        return self.offset_loss_weight * loss

    def _dummy_extra_heads(self, feats, rois):
        f = self._roi_align_cfg(self.offset_extractor_cfg, feats, rois, None)
        return [self.offset_head_m(f)]

    def _extra_forward_train(self, feats, batch, rcnn, pos_boxes, pos_is_pos,
                             pos_gt, flat_pack=None):
        """Offset branch on positive RoIs.

        reference: ``loft_roi_head.py:127-144`` (``_offset_forward_train``) +
        ``offset_head_expand_feature.py:271-344`` (targets).
        """
        b, p = pos_boxes.shape[:2]
        gt_offsets = batch["gt_offsets"]
        rois, roi_valid = boxes_to_rois(pos_boxes, pos_is_pos)
        ofeats = self._roi_align_cfg(self.offset_extractor_cfg, feats, rois,
                                     roi_valid, flat_pack=flat_pack)
        pred = self.offset_head_m(ofeats)                 # (E, BP, 2) | (BP, 2)

        bidx = jnp.arange(b)[:, None]
        matched_off = gt_offsets[bidx, pos_gt].reshape(b * p, 2)
        flat_boxes = rois[:, 1:5]
        if self.foa:
            targets = foa_offset_targets(
                flat_boxes, matched_off, self.offset_head_m.rotations,
                self.offset_coder_means, self.offset_coder_stds)   # (E, BP, 2)
            w = roi_valid.astype(jnp.float32)[None, :, None]
            w = jnp.broadcast_to(w, targets.shape)
        else:
            from ...core.boxes import offset2delta
            targets = offset2delta(flat_boxes, matched_off,
                                   self.offset_coder_means,
                                   self.offset_coder_stds)
            w = roi_valid.astype(jnp.float32)[:, None]
            w = jnp.broadcast_to(w, targets.shape)
        return {"loss_offset": self._offset_loss(pred, targets, w)}

    def _extra_simple_test(self, feats, det_boxes, det_valid, img_shape,
                           scale_factor, flat_pack=None):
        """reference: ``test_mixins.py:213-241`` + ``offset_fusion`` +
        ``DeltaXYOffsetCoder.decode`` (max_shape = img_shape); with
        ``rescale=True`` the offsets are mapped back to original-image
        pixels alongside the boxes (÷ scale_factor)."""
        b, p = det_boxes.shape[:2]
        rois, roi_valid = boxes_to_rois(det_boxes, det_valid)
        ofeats = self._roi_align_cfg(self.offset_extractor_cfg, feats, rois,
                                     roi_valid, flat_pack=flat_pack)
        pred = self.offset_head_m(ofeats)
        if self.foa:
            fused = foa_offset_fusion(pred, self.offset_head_m.rotations)
        else:
            fused = pred
        img_shape = jnp.asarray(img_shape)
        hs = jnp.repeat(img_shape[:, 0], p)
        ws = jnp.repeat(img_shape[:, 1], p)
        offsets = delta2offset(rois[:, 1:5], fused, self.offset_coder_means,
                               self.offset_coder_stds, max_shape=(hs, ws))
        offsets = offsets.reshape(b, p, 2)
        return {"offsets":
                offsets / jnp.asarray(scale_factor)[:, None, None]}
