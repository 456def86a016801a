"""Hybrid Task Cascade (HTC).

reference: ``mmdet/models/detectors/htc.py`` +
``mmdet/models/roi_heads/htc_roi_head.py:11-539`` — Cascade R-CNN with
(1) a mask branch at EVERY stage whose conv features flow into the next
stage's mask head (``mask_info_flow``), (2) interleaved execution (the
stage's mask samples from the boxes refined by that stage's bbox head),
and (3) an optional fused semantic branch whose embedding is added to
the bbox/mask RoI features and supervised with a segmentation loss.

TPU-first: all stages stay fixed-capacity batched ops; the semantic
embedding is fused by extracting it with the SAME fused RoIAlign at the
target RoI resolution (the reference extracts at 14x14 then adaptive-
pools to match — extracting at the right size directly is equivalent
for bilinear pooling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.boxes import delta2bbox, clip_boxes
from ...core.masks import mask_targets_from_instance_masks
from ..losses import binary_cross_entropy, cross_entropy, l1_loss
from ..roi_heads.bbox_head import bbox_targets_single
from ..roi_heads.mask_head import FusedSemanticHead, HTCMaskHead
from .cascade_rcnn import CascadeRCNN
from .two_stage import assign_and_sample_rcnn, boxes_to_rois


class HTC(CascadeRCNN):
    def _setup_roi_head(self, dt):
        super()._setup_roi_head(dt)
        cfg = dict(self.roi_head)
        self.mask_info_flow = bool(cfg.get("mask_info_flow", True))
        self.interleaved = bool(cfg.get("interleaved", True))
        mh = cfg.get("mask_head")
        if mh is not None:
            heads = mh if isinstance(mh, list) else [mh] * self.num_stages
            self.mask_heads_m = [HTCMaskHead(
                num_convs=h.get("num_convs", 4),
                in_channels=h.get("in_channels", 256),
                conv_out_channels=h.get("conv_out_channels", 256),
                num_classes=h.get("num_classes", 1),
                dtype=dt, name=f"mask_head_{i}")
                for i, h in enumerate(heads)]
            self.mask_extractor_cfg = dict(cfg["mask_roi_extractor"])
        else:
            self.mask_heads_m = None
        sem = cfg.get("semantic_head")
        if sem is not None:
            sem = dict(sem)
            self.semantic_head_m = FusedSemanticHead(
                num_ins=sem.get("num_ins", 5),
                fusion_level=sem.get("fusion_level", 1),
                num_convs=sem.get("num_convs", 4),
                in_channels=sem.get("in_channels", 256),
                conv_out_channels=sem.get("conv_out_channels", 256),
                num_classes=sem.get("num_classes", 183),
                dtype=dt, name="semantic_head")
            # reference htc configs pass a flat ``loss_weight``
            # (htc_r50_fpn_1x_coco.py); the bonai ones nest it under
            # ``loss_seg`` — accept both
            self.semantic_loss_weight = dict(
                sem.get("loss_seg") or {}).get(
                "loss_weight", sem.get("loss_weight", 0.2))
            self.semantic_stride = int(dict(cfg.get(
                "semantic_roi_extractor",
                {"featmap_strides": [8]}))["featmap_strides"][0])
            self.semantic_fusion = tuple(cfg.get("semantic_fusion",
                                                 ("bbox", "mask")))
        else:
            self.semantic_head_m = None

    @property
    def with_mask(self):
        return self.mask_heads_m is not None

    def __call__(self, img):
        """Init path: touch every stage's bbox + mask head (incl. the
        info-flow conv_res branches) and the semantic head."""
        feats = self.extract_feat(img)
        outs = self.rpn_head_m(feats)
        rois = jnp.tile(jnp.asarray([[0., 0., 0., 32., 32.]]), (4, 1))
        bf = self._roi_align_cfg(self.bbox_extractor_cfg, feats, rois,
                                 None)
        extra = [h(bf) for h in self.bbox_heads_m]
        sem_feat = None
        if self.semantic_head_m is not None:
            seg_logits, sem_feat = self.semantic_head_m(feats)
            extra.append(seg_logits)
        if self.with_mask:
            flat_pack = self._flat_pack(feats)
            for i in range(self.num_stages):
                extra.append(self._mask_stage(i, feats, rois, None,
                                              sem_feat, flat_pack))
        return outs, extra

    def _fuse_semantic(self, roi_feats, rois, roi_valid, sem_feat):
        from ...ops.roi_align import roi_align
        out = roi_align(sem_feat, rois, roi_feats.shape[1],
                        1.0 / self.semantic_stride)
        if roi_valid is not None:
            out = out * roi_valid[:, None, None, None].astype(out.dtype)
        return roi_feats + out.astype(roi_feats.dtype)

    def _mask_stage(self, stage, feats, rois, roi_valid, sem_feat,
                    flat_pack, with_logits=True):
        """Mask features + info-flow chain at one stage."""
        mf = self._roi_align_cfg(self.mask_extractor_cfg, feats, rois,
                                 roi_valid, flat_pack=flat_pack)
        if sem_feat is not None and "mask" in self.semantic_fusion:
            mf = self._fuse_semantic(mf, rois, roi_valid, sem_feat)
        last_feat = None
        if self.mask_info_flow:
            for i in range(stage):
                last_feat = self.mask_heads_m[i](
                    mf, last_feat, return_logits=False, return_feat=True)
        return self.mask_heads_m[stage](mf, last_feat,
                                        return_logits=with_logits,
                                        return_feat=False)

    def _roi_forward_train(self, feats, proposals, prop_valid, batch, rng):
        gt_bboxes = batch["gt_bboxes"]
        gt_valid = batch["gt_valid"]
        gt_labels = batch["gt_labels"]
        gt_masks = batch.get("gt_masks")
        b = gt_bboxes.shape[0]
        stage_cfgs = self.train_cfg["rcnn"]
        if isinstance(stage_cfgs, dict):
            stage_cfgs = [stage_cfgs] * self.num_stages
        flat_pack = self._flat_pack(feats)
        losses = {}

        sem_feat = None
        if self.semantic_head_m is not None:
            seg_logits, sem_feat = self.semantic_head_m(feats)
            if "gt_semantic_seg" in batch:
                tgt = batch["gt_semantic_seg"]            # (B, Hs, Ws)
                sl = jax.image.resize(
                    seg_logits, (b,) + tuple(tgt.shape[1:3])
                    + (seg_logits.shape[-1],), method="bilinear")
                losses["loss_semantic"] = self.semantic_loss_weight * \
                    cross_entropy(sl.reshape(-1, sl.shape[-1]),
                                  tgt.reshape(-1).astype(jnp.int32),
                                  jnp.ones(tgt.size, jnp.float32))

        cur_boxes, cur_valid = proposals, prop_valid
        for i in range(self.num_stages):
            rcnn = dict(stage_cfgs[i])
            sampler_cfg = dict(rcnn["sampler"])
            num = sampler_cfg.get("num", 512)
            num_pos = int(num * sampler_cfg.get("pos_fraction", 0.25))
            rngs = jax.random.split(jax.random.fold_in(rng, i), b)
            res, sampled = jax.vmap(
                lambda r, p, pv, gb, gv: assign_and_sample_rcnn(
                    r, p, pv, gb, gv, dict(rcnn["assigner"]), sampler_cfg)
            )(rngs, cur_boxes, cur_valid, gt_bboxes, gt_valid)
            coder = self.bbox_coders[i]
            labels, lw, bt, bw = jax.vmap(
                lambda sb, ip, v, pg, gb, gl: bbox_targets_single(
                    sb, {"is_pos": ip, "valid": v, "pos_gt_inds": pg},
                    gb, gl, self.bbox_heads_m[i].num_classes,
                    tuple(coder.get("target_means", (0.,) * 4)),
                    tuple(coder.get("target_stds", (1.,) * 4)))
            )(sampled, res["is_pos"], res["valid"], res["pos_gt_inds"],
              gt_bboxes, gt_labels)
            rois, roi_valid = boxes_to_rois(sampled, res["valid"])
            bf = self._roi_align_cfg(self.bbox_extractor_cfg, feats, rois,
                                     roi_valid, flat_pack=flat_pack)
            if sem_feat is not None and "bbox" in self.semantic_fusion:
                bf = self._fuse_semantic(bf, rois, roi_valid, sem_feat)
            cls_score, bbox_pred = self.bbox_heads_m[i](bf)
            n_tot = b * num
            w = self.stage_loss_weights[i]
            avg_cls = jnp.maximum(jnp.sum(lw.reshape(-1) > 0), 1.0)
            losses[f"s{i}.loss_cls"] = w * cross_entropy(
                cls_score, labels.reshape(-1), lw.reshape(-1),
                avg_factor=avg_cls)
            losses[f"s{i}.loss_bbox"] = w * l1_loss(
                bbox_pred.reshape(n_tot, -1)[:, :4], bt.reshape(n_tot, 4),
                bw.reshape(n_tot, 4), avg_factor=float(n_tot))

            refined = delta2bbox(
                rois[:, 1:5], bbox_pred.reshape(n_tot, -1)[:, :4],
                tuple(coder.get("target_means", (0.,) * 4)),
                tuple(coder.get("target_stds", (1.,) * 4)))
            refined = jax.vmap(clip_boxes)(
                refined.reshape(b, num, 4), batch["img_shape"])
            refined = jax.lax.stop_gradient(refined)

            if self.with_mask and gt_masks is not None:
                if self.interleaved:
                    # re-assign + sample on the refined boxes (reference
                    # htc_roi_head.py:281-301)
                    rngs2 = jax.random.split(
                        jax.random.fold_in(rng, 100 + i), b)
                    mres, msampled = jax.vmap(
                        lambda r, p, pv, gb, gv: assign_and_sample_rcnn(
                            r, p, pv, gb, gv, dict(rcnn["assigner"]),
                            sampler_cfg)
                    )(rngs2, refined, res["valid"], gt_bboxes, gt_valid)
                else:
                    mres, msampled = res, sampled
                pos_boxes = msampled[:, :num_pos]
                pos_is_pos = mres["is_pos"][:, :num_pos]
                pos_gt = mres["pos_gt_inds"][:, :num_pos]
                mrois, mvalid = boxes_to_rois(pos_boxes, pos_is_pos)
                logits = self._mask_stage(i, feats, mrois, mvalid,
                                          sem_feat, flat_pack)
                mask_size = rcnn.get("mask_size", 28)
                bidx = jnp.arange(b)[:, None]
                mboxes = gt_bboxes[bidx, pos_gt].reshape(-1, 4)
                mmasks = gt_masks[bidx, pos_gt].reshape(
                    -1, *gt_masks.shape[-2:])
                targets = mask_targets_from_instance_masks(
                    mrois[:, 1:5], mboxes, mmasks, mask_size)
                lm = logits[..., 0]
                wm = mvalid.astype(jnp.float32)[:, None, None]
                losses[f"s{i}.loss_mask"] = w * binary_cross_entropy(
                    lm, targets, jnp.broadcast_to(wm, lm.shape),
                    avg_factor=jnp.maximum(
                        jnp.sum(wm) * mask_size * mask_size, 1.0))

            if i < self.num_stages - 1:
                cur_boxes, cur_valid = refined, res["valid"]
        return losses

    def simple_test(self, img, img_shape, scale_factor):
        # explicit cascade box path (semantic fusion changes the bbox
        # features vs the parent implementation)
        feats = self.extract_feat(img)
        test_rpn = dict(self.test_cfg.get("rpn", {}))
        (_, _, _, proposals, _, prop_valid) = self._rpn_and_proposals(
            feats, img_shape, test_rpn)
        rcnn = dict(self.test_cfg["rcnn"])
        b, n = proposals.shape[:2]
        flat_pack = self._flat_pack(feats)
        sem_feat = None
        if self.semantic_head_m is not None:
            _, sem_feat = self.semantic_head_m(feats)
        cur = proposals
        ms_scores = []
        for i in range(self.num_stages):
            rois, roi_valid = boxes_to_rois(cur, prop_valid)
            bf = self._roi_align_cfg(self.bbox_extractor_cfg, feats, rois,
                                     roi_valid, flat_pack=flat_pack)
            if sem_feat is not None and "bbox" in self.semantic_fusion:
                bf = self._fuse_semantic(bf, rois, roi_valid, sem_feat)
            cls_score, bbox_pred = self.bbox_heads_m[i](bf)
            ms_scores.append(jax.nn.softmax(cls_score, -1))
            coder = self.bbox_coders[i]
            decoded = delta2bbox(
                rois[:, 1:5], bbox_pred.reshape(b * n, -1)[:, :4],
                tuple(coder.get("target_means", (0.,) * 4)),
                tuple(coder.get("target_stds", (1.,) * 4)))
            cur = jax.vmap(clip_boxes)(decoded.reshape(b, n, 4), img_shape)
        scores = (sum(ms_scores) / len(ms_scores)).reshape(b, n, -1)
        from ...core.nms import multiclass_nms
        max_per_img = rcnn.get("max_per_img", 100)
        nms_cfg = dict(rcnn.get("nms", dict(type="nms", iou_threshold=0.5)))
        det_boxes, det_scores, det_labels, det_valid = jax.vmap(
            lambda bx, sc, v: multiclass_nms(
                bx, sc, rcnn.get("score_thr", 0.05), nms_cfg, max_per_img,
                valid=v))(cur, scores, prop_valid)
        out = {"det_bboxes": det_boxes / jnp.asarray(
                   scale_factor)[:, None, None],
               "det_scores": det_scores, "det_labels": det_labels,
               "det_valid": det_valid}
        if self.with_mask:
            rois, roi_valid = boxes_to_rois(det_boxes, det_valid)
            # average the per-stage mask predictions (reference
            # htc_roi_head.py:384-405 merge over stages)
            acc = 0.0
            for i in range(self.num_stages):
                logits = self._mask_stage(i, feats, rois, roi_valid,
                                          sem_feat, flat_pack)
                acc = acc + jax.nn.sigmoid(logits[..., 0])
            probs = acc / self.num_stages
            out["mask_probs"] = probs.reshape(b, -1, *probs.shape[1:3])
        return out
