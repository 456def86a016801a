"""Cascade R-CNN.

reference: ``mmdet/models/detectors/cascade_rcnn.py`` +
``mmdet/models/roi_heads/cascade_roi_head.py`` — 3 bbox stages with
rising IoU thresholds and shrinking delta stds; each stage refines the
proposals for the next; test-time class scores are averaged across
stages evaluated on the running boxes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.boxes import delta2bbox, clip_boxes
from ...core.nms import multiclass_nms
from ..losses import cross_entropy, l1_loss
from ..roi_heads.bbox_head import Shared2FCBBoxHead, bbox_targets_single
from .two_stage import (TwoStageDetector, assign_and_sample_rcnn,
                        boxes_to_rois)


class CascadeRCNN(TwoStageDetector):
    def _setup_roi_head(self, dt):
        cfg = dict(self.roi_head)
        heads = cfg["bbox_head"]
        if isinstance(heads, dict):
            heads = [heads] * cfg.get("num_stages", 3)
        self.num_stages = len(heads)
        self.stage_loss_weights = list(cfg.get(
            "stage_loss_weights", [1.0, 0.5, 0.25][:self.num_stages]))
        self.bbox_heads_m = [Shared2FCBBoxHead(
            num_classes=h.get("num_classes", 1),
            in_channels=h.get("in_channels", 256),
            fc_out_channels=h.get("fc_out_channels", 1024),
            roi_feat_size=h.get("roi_feat_size", 7),
            reg_class_agnostic=h.get("reg_class_agnostic", True),
            dtype=dt, name=f"bbox_head_{i}") for i, h in enumerate(heads)]
        self.bbox_coders = [dict(h.get("bbox_coder", dict(
            target_means=[0.] * 4, target_stds=[0.1, 0.1, 0.2, 0.2])))
            for h in heads]
        # first head drives the shared extractor config / nc
        self.bbox_head_m = self.bbox_heads_m[0]
        self.bbox_coder_cfg = self.bbox_coders[-1]
        self.bbox_extractor_cfg = dict(cfg["bbox_roi_extractor"])
        # NB: flax freezes dict attrs to FrozenDict — test by exclusion
        # (HTC passes a per-stage LIST and builds its own heads)
        if cfg.get("mask_head") is not None \
                and not isinstance(cfg["mask_head"], (list, tuple)):
            from ..roi_heads.mask_head import FCNMaskHead
            mh = dict(cfg["mask_head"])
            self.mask_head_m = FCNMaskHead(
                num_convs=mh.get("num_convs", 4),
                in_channels=mh.get("in_channels", 256),
                conv_out_channels=mh.get("conv_out_channels", 256),
                num_classes=mh.get("num_classes", 1),
                dtype=dt, name="mask_head")
            self.mask_extractor_cfg = dict(cfg["mask_roi_extractor"])
        else:
            self.mask_head_m = None
        self.mask_iou_head_m = None
        self.shared_head_m = None   # C4 shared head: StandardRoIHead only

    def __call__(self, img):
        feats = self.extract_feat(img)
        outs = self.rpn_head_m(feats)
        rois = jnp.tile(jnp.asarray([[0., 0., 0., 32., 32.]]), (4, 1))
        bf = self._roi_align_cfg(self.bbox_extractor_cfg, feats, rois, None)
        extra = [h(bf) for h in self.bbox_heads_m]
        if self.with_mask:
            mf = self._roi_align_cfg(self.mask_extractor_cfg, feats, rois,
                                     None)
            extra.append(self.mask_head_m(mf))
        return outs, extra

    def _roi_forward_train(self, feats, proposals, prop_valid, batch, rng):
        gt_bboxes = batch["gt_bboxes"]
        gt_valid = batch["gt_valid"]
        gt_labels = batch["gt_labels"]
        b = gt_bboxes.shape[0]
        stage_cfgs = self.train_cfg["rcnn"]
        if isinstance(stage_cfgs, dict):
            stage_cfgs = [stage_cfgs] * self.num_stages
        flat_pack = self._flat_pack(feats)
        losses = {}
        cur_boxes, cur_valid = proposals, prop_valid
        last = None
        for i in range(self.num_stages):
            rcnn = dict(stage_cfgs[i])
            sampler_cfg = dict(rcnn["sampler"])
            num = sampler_cfg.get("num", 512)
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
            last = (sampled, res)
            if i < self.num_stages - 1:
                # refine: decode the sampled boxes with this stage's preds
                refined = delta2bbox(
                    rois[:, 1:5], bbox_pred.reshape(n_tot, -1)[:, :4],
                    tuple(coder.get("target_means", (0.,) * 4)),
                    tuple(coder.get("target_stds", (1.,) * 4)))
                refined = jax.vmap(clip_boxes)(
                    refined.reshape(b, num, 4), batch["img_shape"])
                cur_boxes = jax.lax.stop_gradient(refined)
                cur_valid = res["valid"]
        # mask branch on the final stage's positive slots
        sampled, res = last
        rcnn_last = dict(stage_cfgs[-1])
        num_pos = int(dict(rcnn_last["sampler"]).get("num", 512)
                      * dict(rcnn_last["sampler"]).get("pos_fraction", 0.25))
        losses.update(self._mask_forward_train(
            feats, batch, rcnn_last, sampled[:, :num_pos],
            res["is_pos"][:, :num_pos], res["pos_gt_inds"][:, :num_pos],
            flat_pack))
        return losses

    def simple_test(self, img, img_shape, scale_factor):
        feats = self.extract_feat(img)
        test_rpn = dict(self.test_cfg.get("rpn", {}))
        (_, _, _, proposals, _, prop_valid) = self._rpn_and_proposals(
            feats, img_shape, test_rpn)
        rcnn = dict(self.test_cfg["rcnn"])
        b, n = proposals.shape[:2]
        flat_pack = self._flat_pack(feats)
        cur = proposals
        ms_scores = []
        for i in range(self.num_stages):
            rois, roi_valid = boxes_to_rois(cur, prop_valid)
            bf = self._roi_align_cfg(self.bbox_extractor_cfg, feats, rois,
                                     roi_valid, flat_pack=flat_pack)
            cls_score, bbox_pred = self.bbox_heads_m[i](bf)
            ms_scores.append(jax.nn.softmax(cls_score, -1))
            coder = self.bbox_coders[i]
            decoded = delta2bbox(
                rois[:, 1:5], bbox_pred.reshape(b * n, -1)[:, :4],
                tuple(coder.get("target_means", (0.,) * 4)),
                tuple(coder.get("target_stds", (1.,) * 4)))
            cur = jax.vmap(clip_boxes)(decoded.reshape(b, n, 4), img_shape)
        scores = (sum(ms_scores) / len(ms_scores)).reshape(b, n, -1)
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
            mf = self._roi_align_cfg(self.mask_extractor_cfg, feats, rois,
                                     roi_valid, flat_pack=flat_pack)
            probs = jax.nn.sigmoid(self.mask_head_m(mf)[..., 0])
            out["mask_probs"] = probs.reshape(b, -1, *probs.shape[1:3])
        return out
