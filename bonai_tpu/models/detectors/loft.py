"""LOFT detector — Mask R-CNN + roof→footprint offset branch (FOA).

reference: ``mmdet/models/detectors/loft.py:11-145``,
``mmdet/models/roi_heads/loft_roi_head.py:22-227``,
``mmdet/models/roi_heads/attribute_heads/offset_head_expand_feature.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.boxes import delta2offset
from ..losses import binary_cross_entropy, smooth_l1_loss, mse_loss
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
        # polar offset regression (reference offset_head.py:175-186,
        # 207-219): offsets ride the pipeline as (length, angle) via
        # OffsetTransform('xy2la'); reg_num=3 regresses
        # (length, cos(angle'), sin(angle')) of the coder-normalised pair
        self.offset_coordinate = oh.get("offset_coordinate", "rectangle")
        self.offset_reg_num = common["reg_num"]
        if self.offset_coordinate == "polar":
            assert not self.foa, \
                "polar offsets pair with the plain OffsetHead (reference)"
            from ...core.boxes import DeltaPolarOffsetCoder
            self.polar_coder = DeltaPolarOffsetCoder(
                self.offset_coder_means, self.offset_coder_stds)
        self.offset_extractor_cfg = dict(cfg["offset_roi_extractor"])

        # ---- experimental attribute heads (reference base_roi_head.py
        # with_height/with_angle/with_side_face/with_offset_field hooks +
        # test_mixins.py:293-445; head modules reconstructed in
        # roi_heads/attribute_heads.py) ----
        from ..roi_heads.attribute_heads import (
            AngleHead, HeightHead, OffsetFieldHead, OffsetHeightHead,
            SideFaceHead)
        self.offset_reweight = bool(cfg.get("offset_reweight", False))

        def _head_cfg(key):
            c = cfg.get(key)
            return dict(c) if c is not None else None

        hh = _head_cfg("height_head")
        self.height_head_m = HeightHead(
            num_convs=hh.get("num_convs", 4),
            num_fcs=hh.get("num_fcs", 2),
            conv_out_channels=hh.get("conv_out_channels", 256),
            fc_out_channels=hh.get("fc_out_channels", 1024),
            dtype=dt, name="height_head") if hh else None
        self.height_loss_weight = (hh or {}).get(
            "loss_weight", 1.0)
        hc = (hh or {}).get("height_coder", {})
        self.height_coder = (tuple(hc.get("target_means", (0.0,))),
                             tuple(hc.get("target_stds", (4.0,))))

        ohh = _head_cfg("offset_height_head")
        self.offset_height_head_m = OffsetHeightHead(
            num_convs=ohh.get("num_convs", 4),
            num_fcs=ohh.get("num_fcs", 2),
            conv_out_channels=ohh.get("conv_out_channels", 256),
            fc_out_channels=ohh.get("fc_out_channels", 1024),
            reg_num=ohh.get("reg_num", 2),
            dtype=dt, name="offset_height_head") if ohh else None

        ah = _head_cfg("angle_head")
        self.angle_head_m = AngleHead(
            in_channels=ah.get("in_channels", 256),
            conv_out_channels=ah.get("conv_out_channels", 256),
            num_convs=ah.get("num_convs", 2),
            dtype=dt, name="angle_head") if ah else None
        self.angle_loss_weight = (ah or {}).get("loss_weight", 1.0)

        sfh = _head_cfg("side_face_head")
        self.side_face_head_m = SideFaceHead(
            num_convs=sfh.get("num_convs", 4),
            conv_out_channels=sfh.get("conv_out_channels", 256),
            dtype=dt, name="side_face_head") if sfh else None
        self.side_face_loss_weight = (sfh or {}).get("loss_weight", 1.0)
        self.side_face_extractor_cfg = dict(
            cfg.get("side_face_roi_extractor",
                    cfg.get("mask_roi_extractor",
                            cfg["offset_roi_extractor"])))

        ofh = _head_cfg("offset_field_head")
        self.offset_field_head_m = OffsetFieldHead(
            num_convs=ofh.get("num_convs", 4),
            conv_out_channels=ofh.get("conv_out_channels", 256),
            dtype=dt, name="offset_field_head") if ofh else None
        self.offset_field_loss_weight = (ofh or {}).get("loss_weight", 1.0)
        self.offset_field_extractor_cfg = dict(
            cfg.get("offset_field_roi_extractor",
                    cfg.get("mask_roi_extractor",
                            cfg["offset_roi_extractor"])))

    def _offset_loss(self, pred, target, weight):
        if self.offset_loss_type == "SmoothL1Loss":
            loss = smooth_l1_loss(pred, target, self.offset_loss_beta,
                                  weight)
        else:
            loss = mse_loss(pred, target, weight)
        return self.offset_loss_weight * loss

    def _dummy_extra_heads(self, feats, rois):
        f = self._roi_align_cfg(self.offset_extractor_cfg, feats, rois, None)
        outs = [self.offset_head_m(f)]
        if self.height_head_m is not None:
            outs.append(self.height_head_m(f))
        if self.offset_height_head_m is not None:
            outs.extend(self.offset_height_head_m(f))
        if self.angle_head_m is not None:
            outs.append(self.angle_head_m(feats))
        if self.side_face_head_m is not None:
            sf = self._roi_align_cfg(self.side_face_extractor_cfg, feats,
                                     rois, None)
            outs.append(self.side_face_head_m(sf))
        if self.offset_field_head_m is not None:
            ff = self._roi_align_cfg(self.offset_field_extractor_cfg, feats,
                                     rois, None)
            outs.append(self.offset_field_head_m(ff))
        return outs

    def _crop_dense_map(self, dense, rois, out_size):
        """Per-RoI crop+resize of an image-resolution dense GT map via the
        same fused RoIAlign (spatial_scale=1) — the TPU replacement for
        the reference's host-side cv2 crops of edge/side-face/offset-field
        maps (``loading.py:441-583``)."""
        if dense.ndim == 3:
            dense = dense[..., None]
        from ...ops.roi_align import roi_align
        return roi_align(dense.astype(jnp.float32), rois, out_size,
                         spatial_scale=1.0)

    def _reweighted_offset_feats(self, feats, rois, roi_valid, ofeats,
                                 flat_pack):
        """OffsetReweightTestMixin semantics (``test_mixins.py:408-445``):
        scale offset RoI features by (sigmoid(side_face+mask)+1)/2."""
        from ..roi_heads.attribute_heads import reweight_roi_feats
        mf = self._roi_align_cfg(self.mask_extractor_cfg, feats, rois,
                                 roi_valid, flat_pack=flat_pack)
        mask_logits = self.mask_head_m(mf)[..., :1]
        sf = self._roi_align_cfg(self.side_face_extractor_cfg, feats, rois,
                                 roi_valid, flat_pack=flat_pack)
        side_logits = self.side_face_head_m(sf)
        return reweight_roi_feats(ofeats, mask_logits, side_logits)

    def _image_level_train(self, feats, batch):
        """Angle head: image-level off-nadir regression; the prediction
        gates the semi-RPN footprint flag (``semi_rpn_head.py:51-60``)."""
        if self.angle_head_m is None or "gt_angle" not in batch:
            return {}, {}
        pred = self.angle_head_m(feats)                    # (B, 1)
        gt = batch["gt_angle"].reshape(-1, 1)
        loss = smooth_l1_loss(pred, gt, 1.0,
                              jnp.ones_like(gt))
        return ({"loss_angle": self.angle_loss_weight * loss},
                {"angle_pred": pred})

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
        if (self.offset_reweight and self.with_mask
                and self.side_face_head_m is not None):
            ofeats = self._reweighted_offset_feats(
                feats, rois, roi_valid, ofeats, flat_pack)
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
        elif self.offset_coordinate == "polar":
            enc = self.polar_coder.encode(flat_boxes, matched_off)
            if self.offset_reg_num == 3:
                targets = jnp.stack([enc[:, 0], jnp.cos(enc[:, 1]),
                                     jnp.sin(enc[:, 1])], -1)
            else:
                targets = enc
            w = roi_valid.astype(jnp.float32)[:, None]
            w = jnp.broadcast_to(w, targets.shape)
        else:
            from ...core.boxes import offset2delta
            targets = offset2delta(flat_boxes, matched_off,
                                   self.offset_coder_means,
                                   self.offset_coder_stds)
            w = roi_valid.astype(jnp.float32)[:, None]
            w = jnp.broadcast_to(w, targets.shape)
        losses = {"loss_offset": self._offset_loss(pred, targets, w)}
        losses.update(self._attribute_forward_train(
            feats, batch, rcnn, pos_gt, rois, roi_valid, ofeats,
            flat_boxes, matched_off, flat_pack))
        return losses

    def _attribute_forward_train(self, feats, batch, rcnn, pos_gt, rois,
                                 roi_valid, ofeats, flat_boxes, matched_off,
                                 flat_pack):
        """Losses for the experimental attribute heads (height / joint
        offset+height / side-face / offset-field), all on the positive-RoI
        slots with padded-row masking."""
        from ..roi_heads.attribute_heads import height2delta
        from ...core.boxes import offset2delta
        from ...core.masks import mask_targets_from_instance_masks
        losses = {}
        b = pos_gt.shape[0]
        bidx = jnp.arange(b)[:, None]
        wv = roi_valid.astype(jnp.float32)

        matched_h = None
        if "gt_building_heights" in batch:
            matched_h = batch["gt_building_heights"][bidx, pos_gt]
            matched_h = matched_h.reshape(-1, 1)            # (BP, 1)
            h_target = height2delta(matched_h, *self.height_coder)

        if self.height_head_m is not None and matched_h is not None:
            h_pred = self.height_head_m(ofeats)
            loss = smooth_l1_loss(h_pred, h_target, 1.0, wv[:, None])
            losses["loss_height"] = self.height_loss_weight * loss

        if self.offset_height_head_m is not None and matched_h is not None:
            off_pred, h_pred = self.offset_height_head_m(ofeats)
            off_t = offset2delta(flat_boxes, matched_off,
                                 self.offset_coder_means,
                                 self.offset_coder_stds)
            loss_o = self._offset_loss(off_pred, off_t,
                                       jnp.broadcast_to(wv[:, None],
                                                        off_t.shape))
            loss_h = smooth_l1_loss(h_pred, h_target, 1.0, wv[:, None])
            losses["loss_offset_height"] = loss_o + \
                self.height_loss_weight * loss_h

        if (self.side_face_head_m is not None
                and "gt_side_face_maps" in batch):
            sfeats = self._roi_align_cfg(self.side_face_extractor_cfg,
                                         feats, rois, roi_valid,
                                         flat_pack=flat_pack)
            logits = self.side_face_head_m(sfeats)[..., 0]   # (BP, 2S, 2S)
            tgt = self._crop_dense_map(batch["gt_side_face_maps"], rois,
                                       logits.shape[1])[..., 0]
            tgt = (tgt > 0.5).astype(jnp.float32)
            w = jnp.broadcast_to(wv[:, None, None], logits.shape)
            s = logits.shape[1]
            loss = binary_cross_entropy(
                logits, tgt, w,
                avg_factor=jnp.maximum(jnp.sum(wv) * s * s, 1.0))
            losses["loss_side_face"] = self.side_face_loss_weight * loss

        if (self.offset_field_head_m is not None
                and "gt_offset_field" in batch):
            ffeats = self._roi_align_cfg(self.offset_field_extractor_cfg,
                                         feats, rois, roi_valid,
                                         flat_pack=flat_pack)
            field = self.offset_field_head_m(ffeats)         # (BP, 2S, 2S, 2)
            s = field.shape[1]
            tgt = self._crop_dense_map(batch["gt_offset_field"], rois, s)
            # supervise only roof pixels: per-RoI crop of the instance mask
            gt_masks = batch["gt_masks"]
            gt_bboxes = batch["gt_bboxes"]
            matched_boxes = gt_bboxes[bidx, pos_gt].reshape(-1, 4)
            matched_masks = gt_masks[bidx, pos_gt].reshape(
                -1, *gt_masks.shape[-2:])
            roof = mask_targets_from_instance_masks(
                rois[:, 1:5], matched_boxes, matched_masks, s)
            w = (roof * wv[:, None, None])[..., None]
            loss = smooth_l1_loss(field, tgt, 1.0,
                                  jnp.broadcast_to(w, field.shape))
            losses["loss_offset_field"] = \
                self.offset_field_loss_weight * loss
        return losses

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
        if (self.offset_reweight and self.with_mask
                and self.side_face_head_m is not None):
            ofeats = self._reweighted_offset_feats(
                feats, rois, roi_valid, ofeats, flat_pack)
        pred = self.offset_head_m(ofeats)
        if self.foa:
            fused = foa_offset_fusion(pred, self.offset_head_m.rotations)
        else:
            fused = pred
        img_shape = jnp.asarray(img_shape)
        if self.offset_coordinate == "polar":
            if self.offset_reg_num == 3:
                angle = jnp.arctan2(fused[:, 2], fused[:, 1])
                fused = jnp.stack([fused[:, 0], angle], -1)
            offsets = self.polar_coder.decode(rois[:, 1:5], fused)
            offsets = offsets.reshape(b, p, 2)
            # rescale the length component only; angles are scale-free
            sf = jnp.asarray(scale_factor)[:, None]
            offsets = jnp.stack([offsets[..., 0] / sf, offsets[..., 1]],
                                -1)
            out = {"offsets": offsets}
            out.update(self._attribute_simple_test(
                feats, rois, roi_valid, ofeats, b, p, flat_pack))
            return out
        hs = jnp.repeat(img_shape[:, 0], p)
        ws = jnp.repeat(img_shape[:, 1], p)
        offsets = delta2offset(rois[:, 1:5], fused, self.offset_coder_means,
                               self.offset_coder_stds, max_shape=(hs, ws))
        offsets = offsets.reshape(b, p, 2)
        out = {"offsets":
               offsets / jnp.asarray(scale_factor)[:, None, None]}
        out.update(self._attribute_simple_test(
            feats, rois, roi_valid, ofeats, b, p, flat_pack))
        return out

    def _attribute_simple_test(self, feats, rois, roi_valid, ofeats, b, p,
                               flat_pack):
        """Inference for the experimental attribute heads
        (``test_mixins.py:293-445``).  Heights are physical quantities
        (metres) and are not rescaled with the image."""
        from ..roi_heads.attribute_heads import (delta2height,
                                                 offset_field_to_offsets)
        out = {}
        if self.height_head_m is not None:
            h = delta2height(self.height_head_m(ofeats),
                             *self.height_coder)
            out["heights"] = h.reshape(b, p)
        if self.offset_height_head_m is not None:
            off_pred, h_pred = self.offset_height_head_m(ofeats)
            off = delta2offset(rois[:, 1:5], off_pred,
                               self.offset_coder_means,
                               self.offset_coder_stds)
            out["offset_height_offsets"] = off.reshape(b, p, 2)
            out["offset_height_heights"] = delta2height(
                h_pred, *self.height_coder).reshape(b, p)
        if self.angle_head_m is not None:
            out["angle"] = self.angle_head_m(feats)[:, 0]    # (B,) radians
        if self.side_face_head_m is not None:
            sfeats = self._roi_align_cfg(self.side_face_extractor_cfg,
                                         feats, rois, roi_valid,
                                         flat_pack=flat_pack)
            logits = self.side_face_head_m(sfeats)
            out["side_face_probs"] = jax.nn.sigmoid(
                logits[..., 0]).reshape(b, p, *logits.shape[1:3])
        if self.offset_field_head_m is not None and self.with_mask:
            ffeats = self._roi_align_cfg(self.offset_field_extractor_cfg,
                                         feats, rois, roi_valid,
                                         flat_pack=flat_pack)
            field = self.offset_field_head_m(ffeats)
            mf = self._roi_align_cfg(self.mask_extractor_cfg, feats, rois,
                                     roi_valid, flat_pack=flat_pack)
            mask_logits = self.mask_head_m(mf)[..., :1]
            off = offset_field_to_offsets(field, mask_logits)
            out["offset_field_offsets"] = off.reshape(b, p, 2)
        return out
