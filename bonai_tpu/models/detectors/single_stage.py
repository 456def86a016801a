"""Single-stage detector (RetinaNet family).

reference: ``mmdet/models/detectors/single_stage.py`` +
``mmdet/models/detectors/retinanet.py``.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors import AnchorGenerator
from ..backbones.resnet import ResNet
from ..dense_heads.retina_head import (RetinaHead, retina_loss,
                                       retina_bboxes_single)
from ..necks.fpn import FPN
from .two_stage import _dtype


class RetinaNet(nn.Module):
    backbone: Any = None
    neck: Any = None
    bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    pretrained: Optional[str] = None
    compute_dtype: str = "float32"

    def setup(self):
        from .builders import build_backbone_m, build_neck_m
        dt = _dtype(self.compute_dtype)
        self.backbone_m = build_backbone_m(self.backbone, dt)
        self.neck_m = build_neck_m(self.neck, dt)
        bh = dict(self.bbox_head)
        # Guided-Anchoring RetinaNet (reference configs/guided_anchoring/
        # ga_retinanet_*: type='RetinaNet' with a GARetinaHead bbox_head)
        self.ga_head = bh.get("type") == "GARetinaHead"
        if self.ga_head:
            from ..dense_heads.ga_rpn_head import GARetinaHead
            self.num_classes = bh.get("num_classes", 80)
            aag = dict(bh.get("approx_anchor_generator", {}))
            self.ga_strides = [s if isinstance(s, (int, float)) else s[0]
                               for s in aag.get("strides",
                                                [8, 16, 32, 64, 128])]
            self.ga_octave_base_scale = aag.get("octave_base_scale", 4)
            self.ga_scales_per_octave = aag.get("scales_per_octave", 3)
            self.ga_ratios = tuple(aag.get("ratios", (0.5, 1.0, 2.0)))
            sag = dict(bh.get("square_anchor_generator", {}))
            self.ga_square_scale = list(sag.get("scales", [4]))[0]
            self.ga_loc_filter_thr = bh.get("loc_filter_thr", 0.01)
            self.ga_target_stds = tuple(dict(bh.get(
                "bbox_coder", {})).get("target_stds", (1., 1., 1., 1.)))
            lc = dict(bh.get("loss_cls", {}))
            self.focal_gamma = lc.get("gamma", 2.0)
            self.focal_alpha = lc.get("alpha", 0.25)
            self.head_m = GARetinaHead(
                num_classes=self.num_classes,
                in_channels=bh.get("in_channels", 256),
                feat_channels=bh.get("feat_channels", 256),
                stacked_convs=bh.get("stacked_convs", 4),
                dtype=dt, name="bbox_head")
            self.anchor_generator = None
            self.loss_cls_cfg = self.loss_bbox_cfg = None
            return
        ag = dict(bh.get("anchor_generator", dict(
            octave_base_scale=4, scales_per_octave=3,
            ratios=[0.5, 1.0, 2.0], strides=[8, 16, 32, 64, 128])))
        if ag.pop("type", None) == "LegacyAnchorGenerator":
            # legacy_1.x retinanet (reference anchor_generator.py:475)
            from ...core.anchors import LegacyAnchorGenerator
            self.anchor_generator = LegacyAnchorGenerator(**ag)
        else:
            self.anchor_generator = AnchorGenerator(**ag)
        self.num_classes = bh.get("num_classes", 80)
        if bh.get("type") == "RetinaSepBNHead":
            # nas_fpn crop640 configs (reference retina_sepbn_head.py):
            # shared convs, per-level BN
            from ..dense_heads.retina_head import RetinaSepBNHead
            self.head_m = RetinaSepBNHead(
                num_classes=self.num_classes,
                in_channels=bh.get("in_channels", 256),
                feat_channels=bh.get("feat_channels", 256),
                stacked_convs=bh.get("stacked_convs", 4),
                num_anchors=self.anchor_generator.num_base_anchors[0],
                num_ins=bh.get("num_ins", 5),
                dtype=dt, name="bbox_head")
        else:
            self.head_m = RetinaHead(
                num_classes=self.num_classes,
                in_channels=bh.get("in_channels", 256),
                feat_channels=bh.get("feat_channels", 256),
                stacked_convs=bh.get("stacked_convs", 4),
                num_anchors=self.anchor_generator.num_base_anchors[0],
                dtype=dt, name="bbox_head")
        lc = dict(bh.get("loss_cls", {}))
        self.focal_gamma = lc.get("gamma", 2.0)
        self.focal_alpha = lc.get("alpha", 0.25)
        # non-default losses dispatch through the registry (GHM-C/GHM-R,
        # reference configs/ghm)
        self.loss_cls_cfg = lc if lc.get("type") not in (
            None, "FocalLoss") else None
        lb = dict(bh.get("loss_bbox", {}))
        self.loss_bbox_cfg = lb if lb.get("type") not in (
            None, "L1Loss", "SmoothL1Loss") else None

    def extract_feat(self, img):
        return self.neck_m(self.backbone_m(img))

    def __call__(self, img):
        return self.head_m(self.extract_feat(img))

    def _anchors(self, feats):
        sizes = [(int(f.shape[1]), int(f.shape[2])) for f in feats]
        return [jnp.asarray(a)
                for a in self.anchor_generator.grid_anchors(sizes)]

    def _ga_geometry(self, feats):
        from ..dense_heads.ga_rpn_head import approx_anchors, square_anchors
        sizes = [(int(f.shape[1]), int(f.shape[2])) for f in feats]
        squares = [jnp.asarray(s) for s in square_anchors(
            sizes, self.ga_strides, self.ga_square_scale)]
        approxs = [jnp.asarray(a) for a in approx_anchors(
            sizes, self.ga_strides, self.ga_octave_base_scale,
            self.ga_scales_per_octave, self.ga_ratios)]
        return sizes, squares, approxs

    def forward_train(self, batch):
        feats = self.extract_feat(batch["image"])
        if self.ga_head:
            from ..dense_heads.ga_rpn_head import ga_retina_loss
            cls_scores, bbox_preds, shape_preds, loc_preds = \
                self.head_m(feats)
            sizes, squares, approxs = self._ga_geometry(feats)
            rng = self.make_rng("sampling") \
                if self.has_rng("sampling") else jax.random.PRNGKey(0)
            tc = dict(self.train_cfg)
            tc.setdefault("assigner", dict(pos_iou_thr=0.5,
                                           neg_iou_thr=0.5,
                                           min_pos_iou=0.0))
            tc.setdefault("sampler", dict(num=256, pos_fraction=0.5))
            return ga_retina_loss(
                cls_scores, bbox_preds, shape_preds, loc_preds, squares,
                approxs, batch["gt_bboxes"], batch["gt_valid"],
                batch["gt_labels"], self.num_classes, rng, tc,
                self.ga_strides, self.ga_octave_base_scale, sizes,
                gamma=self.focal_gamma, alpha=self.focal_alpha)
        cls_scores, bbox_preds = self.head_m(feats)
        anchors_flat = jnp.concatenate(self._anchors(feats), axis=0)
        tc = dict(self.train_cfg)
        # PISA (reference configs/pisa: train_cfg carries isr/carl)
        pisa = {k: tc[k] for k in ("isr", "carl") if tc.get(k)} or None
        return retina_loss(cls_scores, bbox_preds, anchors_flat,
                           batch["gt_bboxes"], batch["gt_valid"],
                           batch["gt_labels"], self.num_classes,
                           tc, gamma=self.focal_gamma,
                           alpha=self.focal_alpha,
                           loss_cls_cfg=self.loss_cls_cfg,
                           loss_bbox_cfg=self.loss_bbox_cfg,
                           pisa_cfg=pisa)

    def simple_test(self, img, img_shape, scale_factor):
        feats = self.extract_feat(img)
        cfg = dict(self.test_cfg)
        if self.ga_head:
            from ..dense_heads.ga_rpn_head import ga_retina_bboxes_single
            cls_scores, bbox_preds, shape_preds, loc_preds = \
                self.head_m(feats)
            _, squares, _ = self._ga_geometry(feats)
            det_boxes, det_scores, det_labels, det_valid = jax.vmap(
                lambda cs, bp, sp, lp, ishape: ga_retina_bboxes_single(
                    cs, bp, sp, lp, squares, ishape, self.num_classes,
                    cfg, target_stds=self.ga_target_stds,
                    loc_filter_thr=self.ga_loc_filter_thr)
            )([s for s in cls_scores], [b for b in bbox_preds],
              [s for s in shape_preds], [p for p in loc_preds], img_shape)
            return {"det_bboxes": det_boxes / jnp.asarray(
                        scale_factor)[:, None, None],
                    "det_scores": det_scores, "det_labels": det_labels,
                    "det_valid": det_valid}
        cls_scores, bbox_preds = self.head_m(feats)
        anchors = self._anchors(feats)
        det_boxes, det_scores, det_labels, det_valid = jax.vmap(
            lambda cs, bp, ishape: retina_bboxes_single(
                cs, bp, anchors, ishape, self.num_classes, cfg)
        )([s for s in cls_scores], [b for b in bbox_preds], img_shape)
        return {"det_bboxes": det_boxes / jnp.asarray(
                    scale_factor)[:, None, None],
                "det_scores": det_scores, "det_labels": det_labels,
                "det_valid": det_valid}


INF_RANGE = 100000000.0


class FCOS(nn.Module):
    """FCOS detector (reference ``mmdet/models/detectors/fcos.py`` —
    SingleStageDetector with FCOSHead)."""
    backbone: Any = None
    neck: Any = None
    bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    pretrained: Optional[str] = None
    compute_dtype: str = "float32"

    def setup(self):
        from ..dense_heads.fcos_head import FCOSHead
        from .builders import build_backbone_m, build_neck_m
        dt = _dtype(self.compute_dtype)
        self.backbone_m = build_backbone_m(self.backbone, dt)
        self.neck_m = build_neck_m(self.neck, dt)
        nk = dict(self.neck[0] if isinstance(self.neck, (list, tuple))
                  else self.neck)
        bh = dict(self.bbox_head)
        self.num_classes = bh.get("num_classes", 80)
        self.strides = tuple(bh.get("strides", (8, 16, 32, 64, 128)))
        self.regress_ranges = tuple(
            tuple(r) for r in bh.get("regress_ranges",
                                     ((-1, 64), (64, 128), (128, 256),
                                      (256, 512), (512, INF_RANGE))))
        # variant axes (reference configs/fcos/fcos_center-normbbox-
        # centeronreg-giou_*.py): center-sampled targets, stride-normalised
        # reg branch, GIoU bbox loss, DCN on the last tower conv
        self.center_sampling = bool(bh.get("center_sampling", False))
        self.center_sample_radius = float(bh.get("center_sample_radius",
                                                 1.5))
        self.norm_on_bbox = bool(bh.get("norm_on_bbox", False))
        lb = dict(bh.get("loss_bbox", {}))
        self.bbox_loss_mode = {"GIoULoss": "giou"}.get(lb.get("type"),
                                                       "iou")
        self.head_m = FCOSHead(
            num_classes=self.num_classes,
            in_channels=bh.get("in_channels", 256),
            feat_channels=bh.get("feat_channels", 256),
            stacked_convs=bh.get("stacked_convs", 4),
            num_levels=nk.get("num_outs", 5),
            centerness_on_reg=bh.get("centerness_on_reg", False),
            norm_on_bbox=self.norm_on_bbox,
            strides=self.strides,
            dcn_on_last_conv=bool(bh.get("dcn_on_last_conv", False)),
            use_gn=("norm_cfg" not in bh
                    or dict(bh.get("norm_cfg") or {}).get("type") == "GN"),
            dtype=dt, name="bbox_head")
        lc = dict(bh.get("loss_cls", {}))
        self.focal_gamma = lc.get("gamma", 2.0)
        self.focal_alpha = lc.get("alpha", 0.25)

    def extract_feat(self, img):
        return self.neck_m(self.backbone_m(img))

    def __call__(self, img):
        return self.head_m(self.extract_feat(img))

    def _points(self, feats):
        from ..dense_heads.fcos_head import fcos_points
        sizes = [(int(f.shape[1]), int(f.shape[2])) for f in feats]
        return [jnp.asarray(p) for p in fcos_points(sizes, self.strides)]

    def forward_train(self, batch):
        from ..dense_heads.fcos_head import fcos_loss
        feats = self.extract_feat(batch["image"])
        cls_scores, bbox_preds, centernesses = self.head_m(feats)
        points = self._points(feats)
        ranges = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(r, jnp.float32),
                              (p.shape[0], 2))
             for p, r in zip(points, self.regress_ranges)], 0)
        strides_flat = jnp.concatenate(
            [jnp.full((p.shape[0],), float(s), jnp.float32)
             for p, s in zip(points, self.strides)], 0)
        return fcos_loss(cls_scores, bbox_preds, centernesses,
                         jnp.concatenate(points, 0), ranges,
                         batch["gt_bboxes"], batch["gt_valid"],
                         batch["gt_labels"], self.num_classes,
                         gamma=self.focal_gamma, alpha=self.focal_alpha,
                         strides_flat=strides_flat,
                         center_sample_radius=(
                             self.center_sample_radius
                             if self.center_sampling else 0.0),
                         bbox_loss_mode=self.bbox_loss_mode)

    def simple_test(self, img, img_shape, scale_factor):
        from ..dense_heads.fcos_head import fcos_bboxes_single
        feats = self.extract_feat(img)
        cls_scores, bbox_preds, centernesses = self.head_m(feats)
        points = self._points(feats)
        cfg = dict(self.test_cfg)
        det_boxes, det_scores, det_labels, det_valid = jax.vmap(
            lambda cs, bp, cn, ishape: fcos_bboxes_single(
                cs, bp, cn, points, ishape, self.num_classes, cfg)
        )([c for c in cls_scores], [b for b in bbox_preds],
          [c for c in centernesses], img_shape)
        return {"det_bboxes": det_boxes / jnp.asarray(
                    scale_factor)[:, None, None],
                "det_scores": det_scores, "det_labels": det_labels,
                "det_valid": det_valid}



class ATSS(nn.Module):
    """ATSS detector (reference ``mmdet/models/detectors/atss.py`` —
    SingleStageDetector with ATSSHead + ATSSAssigner)."""
    backbone: Any = None
    neck: Any = None
    bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    pretrained: Optional[str] = None
    compute_dtype: str = "float32"

    def setup(self):
        from ..dense_heads.atss_head import ATSSHead
        dt = _dtype(self.compute_dtype)
        from .builders import build_backbone_m, build_neck_m
        self.backbone_m = build_backbone_m(self.backbone, dt)
        self.neck_m = build_neck_m(self.neck, dt)
        nk = dict(self.neck[0] if isinstance(self.neck, (list, tuple))
                  else self.neck)
        bh = dict(self.bbox_head)
        ag = dict(bh.get("anchor_generator", dict(
            ratios=[1.0], octave_base_scale=8, scales_per_octave=1,
            strides=[8, 16, 32, 64, 128])))
        ag.pop("type", None)
        self.anchor_generator = AnchorGenerator(**ag)
        self.num_classes = bh.get("num_classes", 80)
        self.head_m = ATSSHead(
            num_classes=self.num_classes,
            in_channels=bh.get("in_channels", 256),
            feat_channels=bh.get("feat_channels", 256),
            stacked_convs=bh.get("stacked_convs", 4),
            num_levels=nk.get("num_outs", 5),
            dtype=dt, name="bbox_head")
        bc = dict(bh.get("bbox_coder", {}))
        self.coder_means = tuple(bc.get("target_means", (0.,) * 4))
        self.coder_stds = tuple(bc.get("target_stds", (0.1, 0.1, 0.2, 0.2)))
        self.atss_topk = dict(self.train_cfg or {}).get(
            "assigner", {}).get("topk", 9)
        lc = dict(bh.get("loss_cls", {}))
        self.focal_gamma = lc.get("gamma", 2.0)
        self.focal_alpha = lc.get("alpha", 0.25)
        self.loss_bbox_weight = dict(bh.get("loss_bbox", {})).get(
            "loss_weight", 2.0)

    def extract_feat(self, img):
        return self.neck_m(self.backbone_m(img))

    def __call__(self, img):
        return self.head_m(self.extract_feat(img))

    def _anchors(self, feats):
        sizes = [(int(f.shape[1]), int(f.shape[2])) for f in feats]
        return [jnp.asarray(a)
                for a in self.anchor_generator.grid_anchors(sizes)]

    def forward_train(self, batch):
        from ..dense_heads.atss_head import atss_loss
        feats = self.extract_feat(batch["image"])
        cls_scores, bbox_preds, centernesses = self.head_m(feats)
        anchors = self._anchors(feats)
        nla = [int(a.shape[0]) for a in anchors]
        return atss_loss(cls_scores, bbox_preds, centernesses,
                         jnp.concatenate(anchors, 0), nla,
                         batch["gt_bboxes"], batch["gt_valid"],
                         batch["gt_labels"], self.num_classes,
                         topk=self.atss_topk,
                         target_means=self.coder_means,
                         target_stds=self.coder_stds,
                         gamma=self.focal_gamma, alpha=self.focal_alpha,
                         loss_bbox_weight=self.loss_bbox_weight)

    def simple_test(self, img, img_shape, scale_factor):
        from ..dense_heads.atss_head import atss_bboxes_single
        feats = self.extract_feat(img)
        cls_scores, bbox_preds, centernesses = self.head_m(feats)
        anchors = self._anchors(feats)
        cfg = dict(self.test_cfg)
        det_boxes, det_scores, det_labels, det_valid = jax.vmap(
            lambda cs, bp, cn, ishape: atss_bboxes_single(
                cs, bp, cn, anchors, ishape, self.num_classes, cfg,
                self.coder_means, self.coder_stds)
        )([c for c in cls_scores], [b for b in bbox_preds],
          [c for c in centernesses], img_shape)
        return {"det_bboxes": det_boxes / jnp.asarray(
                    scale_factor)[:, None, None],
                "det_scores": det_scores, "det_labels": det_labels,
                "det_valid": det_valid}


class FSAF(nn.Module):
    """FSAF detector (reference ``mmdet/models/detectors/fsaf.py`` —
    RetinaNet trunk with the feature-selective anchor-free head)."""
    backbone: Any = None
    neck: Any = None
    bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    pretrained: Optional[str] = None
    compute_dtype: str = "float32"

    def setup(self):
        from ..dense_heads.fsaf_head import FSAFHead
        dt = _dtype(self.compute_dtype)
        from .builders import build_backbone_m, build_neck_m
        self.backbone_m = build_backbone_m(self.backbone, dt)
        self.neck_m = build_neck_m(self.neck, dt)
        nk = dict(self.neck[0] if isinstance(self.neck, (list, tuple))
                  else self.neck)
        bh = dict(self.bbox_head)
        self.num_classes = bh.get("num_classes", 80)
        self.strides = tuple(bh.get("strides", (8, 16, 32, 64, 128)))
        self.head_m = FSAFHead(
            num_classes=self.num_classes,
            in_channels=bh.get("in_channels", 256),
            feat_channels=bh.get("feat_channels", 256),
            stacked_convs=bh.get("stacked_convs", 4),
            dtype=dt, name="bbox_head")
        self.pos_scale = dict(self.train_cfg or {}).get(
            "assigner", {}).get("pos_scale", 0.2)
        lc = dict(bh.get("loss_cls", {}))
        self.focal_gamma = lc.get("gamma", 2.0)
        self.focal_alpha = lc.get("alpha", 0.25)

    def extract_feat(self, img):
        return self.neck_m(self.backbone_m(img))

    def __call__(self, img):
        return self.head_m(self.extract_feat(img))

    def forward_train(self, batch):
        from ..dense_heads.fsaf_head import fsaf_loss
        feats = self.extract_feat(batch["image"])
        cls_scores, reg_preds = self.head_m(feats)
        return fsaf_loss(cls_scores, reg_preds, batch["gt_bboxes"],
                         batch["gt_valid"], batch["gt_labels"],
                         self.num_classes, self.strides,
                         pos_scale=self.pos_scale,
                         gamma=self.focal_gamma, alpha=self.focal_alpha)

    def simple_test(self, img, img_shape, scale_factor):
        from ..dense_heads.fsaf_head import fsaf_bboxes_single
        feats = self.extract_feat(img)
        cls_scores, reg_preds = self.head_m(feats)
        cfg = dict(self.test_cfg)
        det_boxes, det_scores, det_labels, det_valid = jax.vmap(
            lambda cs, rp, ishape: fsaf_bboxes_single(
                cs, rp, ishape, self.num_classes, self.strides, cfg)
        )([c for c in cls_scores], [r for r in reg_preds], img_shape)
        return {"det_bboxes": det_boxes / jnp.asarray(
                    scale_factor)[:, None, None],
                "det_scores": det_scores, "det_labels": det_labels,
                "det_valid": det_valid}


class GFL(nn.Module):
    """GFL detector (reference ``mmdet/models/detectors/gfl.py`` —
    SingleStageDetector with GFLHead: QFL/DFL + distributed boxes)."""
    backbone: Any = None
    neck: Any = None
    bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    pretrained: Optional[str] = None
    compute_dtype: str = "float32"

    def setup(self):
        from ..dense_heads.gfl_head import GFLHead
        dt = _dtype(self.compute_dtype)
        from .builders import build_backbone_m, build_neck_m
        self.backbone_m = build_backbone_m(self.backbone, dt)
        self.neck_m = build_neck_m(self.neck, dt)
        nk = dict(self.neck[0] if isinstance(self.neck, (list, tuple))
                  else self.neck)
        bh = dict(self.bbox_head)
        ag = dict(bh.get("anchor_generator", dict(
            ratios=[1.0], octave_base_scale=8, scales_per_octave=1,
            strides=[8, 16, 32, 64, 128])))
        ag.pop("type", None)
        self.anchor_generator = AnchorGenerator(**ag)
        self.strides = [s[0] if isinstance(s, (tuple, list)) else s
                        for s in self.anchor_generator.strides]
        self.num_classes = bh.get("num_classes", 80)
        self.reg_max = bh.get("reg_max", 16)
        self.head_m = GFLHead(
            num_classes=self.num_classes,
            in_channels=bh.get("in_channels", 256),
            feat_channels=bh.get("feat_channels", 256),
            stacked_convs=bh.get("stacked_convs", 4),
            reg_max=self.reg_max,
            num_levels=nk.get("num_outs", 5),
            dtype=dt, name="bbox_head")
        self.atss_topk = dict(self.train_cfg or {}).get(
            "assigner", {}).get("topk", 9)
        self.qfl_beta = dict(bh.get("loss_cls", {})).get("beta", 2.0)
        self.loss_cls_weight = dict(bh.get("loss_cls", {})).get(
            "loss_weight", 1.0)
        self.loss_bbox_weight = dict(bh.get("loss_bbox", {})).get(
            "loss_weight", 2.0)
        self.loss_dfl_weight = dict(bh.get("loss_dfl", {})).get(
            "loss_weight", 0.25)

    def extract_feat(self, img):
        return self.neck_m(self.backbone_m(img))

    def __call__(self, img):
        return self.head_m(self.extract_feat(img))

    def _anchors(self, feats):
        sizes = [(int(f.shape[1]), int(f.shape[2])) for f in feats]
        return [jnp.asarray(a)
                for a in self.anchor_generator.grid_anchors(sizes)]

    def forward_train(self, batch):
        from ..dense_heads.gfl_head import gfl_loss
        feats = self.extract_feat(batch["image"])
        cls_scores, bbox_preds = self.head_m(feats)
        anchors = self._anchors(feats)
        nla = [int(a.shape[0]) for a in anchors]
        stride_flat = jnp.concatenate(
            [jnp.full((n,), float(s)) for n, s in zip(nla, self.strides)])
        return gfl_loss(cls_scores, bbox_preds,
                        jnp.concatenate(anchors, 0), stride_flat, nla,
                        batch["gt_bboxes"], batch["gt_valid"],
                        batch["gt_labels"], self.num_classes,
                        reg_max=self.reg_max, topk=self.atss_topk,
                        qfl_beta=self.qfl_beta,
                        loss_cls_weight=self.loss_cls_weight,
                        loss_bbox_weight=self.loss_bbox_weight,
                        loss_dfl_weight=self.loss_dfl_weight)

    def simple_test(self, img, img_shape, scale_factor):
        from ..dense_heads.gfl_head import gfl_bboxes_single
        feats = self.extract_feat(img)
        cls_scores, bbox_preds = self.head_m(feats)
        anchors = self._anchors(feats)
        cfg = dict(self.test_cfg)
        det_boxes, det_scores, det_labels, det_valid = jax.vmap(
            lambda cs, bp, ishape: gfl_bboxes_single(
                cs, bp, anchors, self.strides, ishape, self.num_classes,
                cfg, reg_max=self.reg_max)
        )([s for s in cls_scores], [b for b in bbox_preds], img_shape)
        return {"det_bboxes": det_boxes / jnp.asarray(
                    scale_factor)[:, None, None],
                "det_scores": det_scores, "det_labels": det_labels,
                "det_valid": det_valid}


class FoveaBox(nn.Module):
    """FoveaBox detector (reference ``mmdet/models/detectors/fovea.py`` —
    SingleStageDetector with FoveaHead)."""
    backbone: Any = None
    neck: Any = None
    bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    pretrained: Optional[str] = None
    compute_dtype: str = "float32"

    def setup(self):
        from ..dense_heads.fovea_head import FoveaHead
        dt = _dtype(self.compute_dtype)
        from .builders import build_backbone_m, build_neck_m
        self.backbone_m = build_backbone_m(self.backbone, dt)
        self.neck_m = build_neck_m(self.neck, dt)
        nk = dict(self.neck[0] if isinstance(self.neck, (list, tuple))
                  else self.neck)
        bh = dict(self.bbox_head)
        self.num_classes = bh.get("num_classes", 80)
        self.strides = tuple(bh.get("strides", (8, 16, 32, 64, 128)))
        self.base_edge_list = tuple(bh.get("base_edge_list",
                                           (16, 32, 64, 128, 256)))
        self.scale_ranges = tuple(tuple(sr) for sr in bh.get(
            "scale_ranges", ((8, 32), (16, 64), (32, 128), (64, 256),
                             (128, 512))))
        self.sigma = bh.get("sigma", 0.4)
        self.head_m = FoveaHead(
            num_classes=self.num_classes,
            in_channels=bh.get("in_channels", 256),
            feat_channels=bh.get("feat_channels", 256),
            stacked_convs=bh.get("stacked_convs", 4),
            with_deform=bool(bh.get("with_deform", False)),
            use_gn=dict(bh.get("norm_cfg") or {}).get("type") == "GN",
            dtype=dt, name="bbox_head")
        lc = dict(bh.get("loss_cls", {}))
        self.focal_gamma = lc.get("gamma", 2.0)
        self.focal_alpha = lc.get("alpha", 0.25)
        lb = dict(bh.get("loss_bbox", {}))
        self.bbox_beta = lb.get("beta", 0.11)
        self.loss_bbox_weight = lb.get("loss_weight", 1.0)

    def extract_feat(self, img):
        return self.neck_m(self.backbone_m(img))

    def __call__(self, img):
        return self.head_m(self.extract_feat(img))

    def forward_train(self, batch):
        from ..dense_heads.fovea_head import fovea_loss
        feats = self.extract_feat(batch["image"])
        cls_scores, bbox_preds = self.head_m(feats)
        return fovea_loss(cls_scores, bbox_preds, batch["gt_bboxes"],
                          batch["gt_valid"], batch["gt_labels"],
                          self.num_classes, strides=self.strides,
                          base_edge_list=self.base_edge_list,
                          scale_ranges=self.scale_ranges, sigma=self.sigma,
                          gamma=self.focal_gamma, alpha=self.focal_alpha,
                          bbox_beta=self.bbox_beta,
                          loss_bbox_weight=self.loss_bbox_weight)

    def simple_test(self, img, img_shape, scale_factor):
        from ..dense_heads.fovea_head import fovea_bboxes_single
        feats = self.extract_feat(img)
        cls_scores, bbox_preds = self.head_m(feats)
        cfg = dict(self.test_cfg)
        det_boxes, det_scores, det_labels, det_valid = jax.vmap(
            lambda cs, bp, ishape: fovea_bboxes_single(
                cs, bp, ishape, self.num_classes, cfg,
                strides=self.strides, base_edge_list=self.base_edge_list)
        )([s for s in cls_scores], [b for b in bbox_preds], img_shape)
        return {"det_bboxes": det_boxes / jnp.asarray(
                    scale_factor)[:, None, None],
                "det_scores": det_scores, "det_labels": det_labels,
                "det_valid": det_valid}


class FreeAnchor(nn.Module):
    """FreeAnchor detector (reference
    ``mmdet/models/detectors/retinanet.py`` with
    ``FreeAnchorRetinaHead`` — same head/anchors as RetinaNet, the
    learning-to-match loss replaces the assignment)."""
    backbone: Any = None
    neck: Any = None
    bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    pretrained: Optional[str] = None
    compute_dtype: str = "float32"

    def setup(self):
        dt = _dtype(self.compute_dtype)
        from .builders import build_backbone_m, build_neck_m
        self.backbone_m = build_backbone_m(self.backbone, dt)
        self.neck_m = build_neck_m(self.neck, dt)
        nk = dict(self.neck[0] if isinstance(self.neck, (list, tuple))
                  else self.neck)
        bh = dict(self.bbox_head)
        ag = dict(bh.get("anchor_generator", dict(
            octave_base_scale=4, scales_per_octave=3,
            ratios=[0.5, 1.0, 2.0], strides=[8, 16, 32, 64, 128])))
        if ag.pop("type", None) == "LegacyAnchorGenerator":
            # legacy_1.x retinanet (reference anchor_generator.py:475)
            from ...core.anchors import LegacyAnchorGenerator
            self.anchor_generator = LegacyAnchorGenerator(**ag)
        else:
            self.anchor_generator = AnchorGenerator(**ag)
        self.num_classes = bh.get("num_classes", 80)
        self.head_m = RetinaHead(
            num_classes=self.num_classes,
            in_channels=bh.get("in_channels", 256),
            feat_channels=bh.get("feat_channels", 256),
            stacked_convs=bh.get("stacked_convs", 4),
            num_anchors=self.anchor_generator.num_base_anchors[0],
            dtype=dt, name="bbox_head")
        bc = dict(bh.get("bbox_coder", {}))
        self.coder_means = tuple(bc.get("target_means", (0.,) * 4))
        self.coder_stds = tuple(bc.get("target_stds", (1.0,) * 4))
        self.pre_anchor_topk = bh.get("pre_anchor_topk", 50)
        self.bbox_thr = bh.get("bbox_thr", 0.6)
        self.fa_gamma = bh.get("gamma", 2.0)
        self.fa_alpha = bh.get("alpha", 0.5)
        lb = dict(bh.get("loss_bbox", {}))
        self.bbox_beta = lb.get("beta", 0.11)
        self.loss_bbox_weight = lb.get("loss_weight", 0.75)

    def extract_feat(self, img):
        return self.neck_m(self.backbone_m(img))

    def __call__(self, img):
        return self.head_m(self.extract_feat(img))

    def _anchors(self, feats):
        sizes = [(int(f.shape[1]), int(f.shape[2])) for f in feats]
        return [jnp.asarray(a)
                for a in self.anchor_generator.grid_anchors(sizes)]

    def forward_train(self, batch):
        from ..dense_heads.free_anchor_head import free_anchor_loss
        feats = self.extract_feat(batch["image"])
        cls_scores, bbox_preds = self.head_m(feats)
        anchors_flat = jnp.concatenate(self._anchors(feats), axis=0)
        return free_anchor_loss(
            cls_scores, bbox_preds, anchors_flat, batch["gt_bboxes"],
            batch["gt_valid"], batch["gt_labels"], self.num_classes,
            target_means=self.coder_means, target_stds=self.coder_stds,
            pre_anchor_topk=self.pre_anchor_topk, bbox_thr=self.bbox_thr,
            gamma=self.fa_gamma, alpha=self.fa_alpha,
            bbox_beta=self.bbox_beta,
            loss_bbox_weight=self.loss_bbox_weight)

    def simple_test(self, img, img_shape, scale_factor):
        feats = self.extract_feat(img)
        cls_scores, bbox_preds = self.head_m(feats)
        anchors = self._anchors(feats)
        cfg = dict(self.test_cfg)
        cfg.setdefault("bbox_std", self.coder_stds)
        det_boxes, det_scores, det_labels, det_valid = jax.vmap(
            lambda cs, bp, ishape: retina_bboxes_single(
                cs, bp, anchors, ishape, self.num_classes, cfg)
        )([s for s in cls_scores], [b for b in bbox_preds], img_shape)
        return {"det_bboxes": det_boxes / jnp.asarray(
                    scale_factor)[:, None, None],
                "det_scores": det_scores, "det_labels": det_labels,
                "det_valid": det_valid}


class SSD(nn.Module):
    """SSD300/512 (reference ``mmdet/models/detectors/ssd.py`` — the
    only SingleStageDetector whose backbone feeds the head directly, no
    neck)."""
    backbone: Any = None
    neck: Any = None                         # unused (SSD has no neck)
    bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    pretrained: Optional[str] = None
    compute_dtype: str = "float32"

    def setup(self):
        from ..backbones.ssd_vgg import SSDVGG
        from ...core.anchors import SSDAnchorGenerator
        dt = _dtype(self.compute_dtype)
        bk = dict(self.backbone or {})
        bk.pop("type", None)
        self.input_size = int(bk.get("input_size", 300))
        self.backbone_m = SSDVGG(
            input_size=self.input_size, depth=bk.get("depth", 16),
            l2_norm_scale=bk.get("l2_norm_scale", 20.0), dtype=dt,
            name="backbone")
        bh = dict(self.bbox_head or {})
        self.num_classes = bh.get("num_classes", 80)
        ag = dict(bh.get("anchor_generator", dict(
            strides=[8, 16, 32, 64, 100, 300],
            ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]],
            basesize_ratio_range=(0.15, 0.9), input_size=300)))
        ag_type = ag.pop("type", "SSDAnchorGenerator")
        ag.setdefault("input_size", self.input_size)
        if ag_type == "LegacySSDAnchorGenerator":
            # legacy_1.x ssd300_coco_v1 (reference anchor_generator.py:563)
            from ...core.anchors import LegacySSDAnchorGenerator
            self.anchor_generator = LegacySSDAnchorGenerator(**ag)
        else:
            self.anchor_generator = SSDAnchorGenerator(**ag)
        from ..dense_heads.ssd_head import SSDHead
        self.head_m = SSDHead(
            num_classes=self.num_classes,
            in_channels=tuple(bh.get(
                "in_channels", (512, 1024, 512, 256, 256, 256))),
            num_anchors=tuple(self.anchor_generator.num_base_anchors),
            dtype=dt, name="bbox_head")
        bc = dict(bh.get("bbox_coder", {}))
        self.target_stds = tuple(bc.get("target_stds",
                                        (0.1, 0.1, 0.2, 0.2)))
        # v1.x +1 size convention (legacy_1.x ssd300_coco_v1)
        self.legacy_coder = bc.get("type") == "LegacyDeltaXYWHBBoxCoder"

    def extract_feat(self, img):
        return self.backbone_m(img)

    def __call__(self, img):
        return self.head_m(self.extract_feat(img))

    def _anchors(self, feats):
        sizes = [(int(f.shape[1]), int(f.shape[2])) for f in feats]
        return [jnp.asarray(a)
                for a in self.anchor_generator.grid_anchors(sizes)]

    def forward_train(self, batch):
        from ..dense_heads.ssd_head import ssd_loss
        feats = self.extract_feat(batch["image"])
        cls_scores, bbox_preds = self.head_m(feats)
        anchors_flat = jnp.concatenate(self._anchors(feats), axis=0)
        tc = dict(self.train_cfg or {})
        pisa = {k: tc[k] for k in ("isr", "carl") if tc.get(k)} or None
        return ssd_loss(cls_scores, bbox_preds, anchors_flat,
                        batch["gt_bboxes"], batch["gt_valid"],
                        batch["gt_labels"], self.num_classes,
                        tc, target_stds=self.target_stds, pisa_cfg=pisa,
                        legacy=self.legacy_coder)

    def simple_test(self, img, img_shape, scale_factor):
        from ..dense_heads.ssd_head import ssd_bboxes_single
        feats = self.extract_feat(img)
        cls_scores, bbox_preds = self.head_m(feats)
        anchors = self._anchors(feats)
        cfg = dict(self.test_cfg or {})
        det_boxes, det_scores, det_labels, det_valid = jax.vmap(
            lambda cs, bp, ishape: ssd_bboxes_single(
                cs, bp, anchors, ishape, self.num_classes, cfg,
                target_stds=self.target_stds, legacy=self.legacy_coder)
        )([s for s in cls_scores], [b for b in bbox_preds], img_shape)
        return {"det_bboxes": det_boxes / jnp.asarray(
                    scale_factor)[:, None, None],
                "det_scores": det_scores, "det_labels": det_labels,
                "det_valid": det_valid}


class RepPointsDetector(nn.Module):
    """RepPoints detector (reference
    ``mmdet/models/detectors/reppoints_detector.py``)."""
    backbone: Any = None
    neck: Any = None
    bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    pretrained: Optional[str] = None
    compute_dtype: str = "float32"

    def setup(self):
        from ..dense_heads.reppoints_head import RepPointsHead
        dt = _dtype(self.compute_dtype)
        from .builders import build_backbone_m, build_neck_m
        self.backbone_m = build_backbone_m(self.backbone, dt)
        self.neck_m = build_neck_m(self.neck, dt)
        nk = dict(self.neck[0] if isinstance(self.neck, (list, tuple))
                  else self.neck)
        bh = dict(self.bbox_head)
        self.num_classes = bh.get("num_classes", 80)
        self.num_points = bh.get("num_points", 9)
        self.strides = tuple(bh.get("point_strides", (8, 16, 32, 64, 128)))
        self.point_base_scale = bh.get("point_base_scale", 4)
        self.transform_method = bh.get("transform_method", "moment")
        self.head_m = RepPointsHead(
            num_classes=self.num_classes,
            in_channels=bh.get("in_channels", 256),
            feat_channels=bh.get("feat_channels", 256),
            point_feat_channels=bh.get("point_feat_channels", 256),
            stacked_convs=bh.get("stacked_convs", 3),
            num_points=self.num_points,
            gradient_mul=bh.get("gradient_mul", 0.1),
            num_levels=nk.get("num_outs", 5),
            transform_method=self.transform_method,
            use_grid_points=bool(bh.get("use_grid_points", False)),
            center_init=bool(bh.get("center_init", True)),
            point_base_scale=self.point_base_scale,
            dtype=dt, name="bbox_head")
        tc = dict(self.train_cfg or {})
        init_as = dict(tc.get("init", {}).get("assigner", {}))
        self.init_assigner = ("max_iou"
                              if init_as.get("type") == "MaxIoUAssigner"
                              else "point")
        self.init_assign_scale = init_as.get("scale", 4)
        self.init_pos_num = init_as.get("pos_num", 1)
        self.init_pos_iou = init_as.get("pos_iou_thr", 0.5)
        self.init_neg_iou = init_as.get("neg_iou_thr", 0.4)
        rf = dict(tc.get("refine", {}).get("assigner", {}))
        self.refine_pos_iou = rf.get("pos_iou_thr", 0.5)
        self.refine_neg_iou = rf.get("neg_iou_thr", 0.4)
        lc = dict(bh.get("loss_cls", {}))
        self.focal_gamma = lc.get("gamma", 2.0)
        self.focal_alpha = lc.get("alpha", 0.25)
        self.loss_init_weight = dict(bh.get("loss_bbox_init", {})).get(
            "loss_weight", 0.5)
        self.loss_refine_weight = dict(bh.get("loss_bbox_refine", {})).get(
            "loss_weight", 1.0)

    def extract_feat(self, img):
        return self.neck_m(self.backbone_m(img))

    def __call__(self, img):
        return self.head_m(self.extract_feat(img))

    def _centers(self, feats):
        """Per-level point coordinates ((x, y) = cell index * stride,
        reference ``PointGenerator.grid_points``)."""
        cs = []
        for f, st in zip(feats, self.strides):
            h, w = int(f.shape[1]), int(f.shape[2])
            ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32) * st,
                                  jnp.arange(w, dtype=jnp.float32) * st,
                                  indexing="ij")
            cs.append(jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1))
        return cs

    def forward_train(self, batch):
        from ..dense_heads.reppoints_head import reppoints_loss
        feats = self.extract_feat(batch["image"])
        cls_scores, pts_init, pts_refine, mt = self.head_m(feats)
        centers = self._centers(feats)
        centers_flat = jnp.concatenate(centers, 0)
        strides_flat = jnp.concatenate(
            [jnp.full((c.shape[0],), float(s))
             for c, s in zip(centers, self.strides)])
        lvl_flat = jnp.concatenate(
            [jnp.full((c.shape[0],), int(np.log2(s)), jnp.int32)
             for c, s in zip(centers, self.strides)])
        return reppoints_loss(
            cls_scores, pts_init, pts_refine, mt, centers_flat,
            strides_flat, lvl_flat, batch["gt_bboxes"], batch["gt_valid"],
            batch["gt_labels"], self.num_classes,
            num_points=self.num_points,
            point_base_scale=self.point_base_scale,
            gamma=self.focal_gamma, alpha=self.focal_alpha,
            init_assign_scale=self.init_assign_scale,
            init_pos_num=self.init_pos_num,
            refine_pos_iou=self.refine_pos_iou,
            refine_neg_iou=self.refine_neg_iou,
            loss_init_weight=self.loss_init_weight,
            loss_refine_weight=self.loss_refine_weight,
            transform_method=self.transform_method,
            init_assigner=self.init_assigner,
            init_pos_iou=self.init_pos_iou,
            init_neg_iou=self.init_neg_iou)

    def simple_test(self, img, img_shape, scale_factor):
        from ..dense_heads.reppoints_head import reppoints_bboxes_single
        feats = self.extract_feat(img)
        cls_scores, pts_init, pts_refine, mt = self.head_m(feats)
        centers = self._centers(feats)
        cfg = dict(self.test_cfg)
        det_boxes, det_scores, det_labels, det_valid = jax.vmap(
            lambda cs, pr, ishape: reppoints_bboxes_single(
                cs, pr, mt, centers, self.strides, ishape,
                self.num_classes, cfg, num_points=self.num_points,
                transform_method=self.transform_method)
        )([s for s in cls_scores], [p for p in pts_refine], img_shape)
        return {"det_bboxes": det_boxes / jnp.asarray(
                    scale_factor)[:, None, None],
                "det_scores": det_scores, "det_labels": det_labels,
                "det_valid": det_valid}


class CornerNet(nn.Module):
    """CornerNet detector (reference ``mmdet/models/detectors/
    cornernet.py`` — SingleStageDetector with HourglassNet + CornerHead;
    decode + soft-NMS replace the anchor pipeline)."""
    backbone: Any = None
    neck: Any = None
    bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    pretrained: Optional[str] = None
    compute_dtype: str = "float32"

    def setup(self):
        from ..backbones.hourglass import HourglassNet
        from ..dense_heads.corner_head import CornerHead
        dt = _dtype(self.compute_dtype)
        bk = dict(self.backbone)
        self.backbone_m = HourglassNet(
            downsample_times=bk.get("downsample_times", 5),
            num_stacks=bk.get("num_stacks", 2),
            stage_channels=tuple(bk.get("stage_channels",
                                        (256, 256, 384, 384, 384, 512))),
            stage_blocks=tuple(bk.get("stage_blocks", (2, 2, 2, 2, 2, 4))),
            feat_channel=bk.get("feat_channel", 256), dtype=dt,
            name="backbone")
        bh = dict(self.bbox_head)
        self.num_classes = bh.get("num_classes", 1)
        self.head_m = CornerHead(
            num_classes=self.num_classes,
            in_channels=bh.get("in_channels", 256),
            num_feat_levels=bh.get("num_feat_levels", 2),
            corner_emb_channels=bh.get("corner_emb_channels", 1),
            dtype=dt, name="bbox_head")
        lh = dict(bh.get("loss_heatmap") or {})
        self.heat_alpha = lh.get("alpha", 2.0)
        self.heat_gamma = lh.get("gamma", 4.0)
        self.heat_weight = lh.get("loss_weight", 1.0)
        le = dict(bh.get("loss_embedding") or {})
        self.pull_weight = le.get("pull_weight", 0.25)
        self.push_weight = le.get("push_weight", 0.25)
        lo = dict(bh.get("loss_offset") or {})
        self.off_beta = lo.get("beta", 1.0)
        self.off_weight = lo.get("loss_weight", 1.0)

    def extract_feat(self, img):
        return self.backbone_m(img)

    def __call__(self, img):
        return self.head_m(self.extract_feat(img))

    def forward_train(self, batch):
        from ..dense_heads.corner_head import corner_targets
        from ..losses import (AssociativeEmbeddingLoss, GaussianFocalLoss,
                              smooth_l1_loss)
        img = batch["image"]
        feats = self.extract_feat(img)
        outs = self.head_m(feats)
        fh, fw = feats[-1].shape[1:3]
        img_h, img_w = img.shape[1:3]
        tgt = jax.vmap(lambda gb, gv: corner_targets(
            gb, gv, fh, fw, img_h, img_w))(
            batch["gt_bboxes"], batch["gt_valid"])
        gfl = GaussianFocalLoss(alpha=self.heat_alpha,
                                gamma=self.heat_gamma,
                                loss_weight=self.heat_weight)
        ael = AssociativeEmbeddingLoss(self.pull_weight, self.push_weight)
        b = img.shape[0]
        bidx = jnp.arange(b)[:, None]
        losses = {}
        det = off = pull = push = 0.0
        for out in outs:
            for side in ("tl", "br"):
                heat_t = tgt[f"{side}_heat"]                 # (B, H, W)
                pos = (heat_t == 1).astype(jnp.float32)
                det += gfl(jax.nn.sigmoid(out[f"{side}_heat"][..., 0]),
                           heat_t,
                           avg_factor=jnp.maximum(jnp.sum(pos), 1.0)) / 2
                # offset loss only at exact corners
                m = pos[..., None]
                off += smooth_l1_loss(
                    out[f"{side}_off"], tgt[f"{side}_off"], self.off_beta,
                    jnp.broadcast_to(m, out[f"{side}_off"].shape),
                    avg_factor=jnp.maximum(jnp.sum(m) * 2, 1.0)) / 2
            if "tl_emb" in out:
                # gather per-gt corner embeddings -> padded AE loss
                tp, bp = tgt["tl_pos"], tgt["br_pos"]        # (B, G, 2)
                te = out["tl_emb"][..., 0][bidx, tp[..., 0], tp[..., 1]]
                be = out["br_emb"][..., 0][bidx, bp[..., 0], bp[..., 1]]
                pl, ps = jax.vmap(ael)(te, be, batch["gt_valid"])
                pull += jnp.mean(pl)
                push += jnp.mean(ps)
        n_lvl = len(outs)
        losses["loss_heatmap"] = det / n_lvl
        losses["loss_offset"] = off / n_lvl
        if "tl_emb" in outs[0]:
            losses["loss_pull"] = pull / n_lvl
            losses["loss_push"] = push / n_lvl
        return losses

    def simple_test(self, img, img_shape, scale_factor):
        from ...core.nms import soft_nms
        from ..dense_heads.corner_head import decode_corners
        feats = self.extract_feat(img)
        outs = self.head_m(feats)
        out = outs[-1]
        cfg = dict(self.test_cfg)
        k = cfg.get("corner_topk", 100)
        num_dets = cfg.get("num_dets", 1000)
        max_per_img = cfg.get("max_per_img", 100)
        nms_cfg = dict(cfg.get("nms", dict(type="soft_nms",
                                           iou_threshold=0.5,
                                           method="gaussian")))
        img_h, img_w = img.shape[1:3]

        def one(level_out, ishape):
            boxes, scores = decode_corners(
                level_out, img_h, img_w, k=k,
                distance_threshold=cfg.get("distance_threshold", 0.5),
                num_dets=num_dets)
            valid = scores > 0
            new_scores, rank = soft_nms(
                boxes, jnp.maximum(scores, 0.0),
                iou_threshold=nms_cfg.get("iou_threshold", 0.5),
                sigma=nms_cfg.get("sigma", 0.5),
                method=nms_cfg.get("method", "gaussian"),
                max_out=max_per_img, valid=valid)
            top_s, top_i = jax.lax.top_k(new_scores, max_per_img)
            return (boxes[top_i], top_s,
                    jnp.zeros((max_per_img,), jnp.int32),
                    (top_s > 0) & (rank[top_i] >= 0))

        det_boxes, det_scores, det_labels, det_valid = jax.vmap(one)(
            out, img_shape)
        return {"det_bboxes": det_boxes / jnp.asarray(
                    scale_factor)[:, None, None],
                "det_scores": det_scores, "det_labels": det_labels,
                "det_valid": det_valid}


class NASFCOS(FCOS):
    """NAS-FCOS (reference ``mmdet/models/detectors/nasfcos.py``): FCOS
    with the searched NASFCOS_FPN merge-cell neck and the searched
    dconv/conv head towers; losses and decode are FCOS's."""

    def setup(self):
        from ..dense_heads.nasfcos_head import NASFCOSHead
        from ..necks.nasfcos_fpn import NASFCOS_FPN
        dt = _dtype(self.compute_dtype)
        from .builders import build_backbone_m
        self.backbone_m = build_backbone_m(self.backbone, dt)
        nk = dict(self.neck)
        self.neck_m = NASFCOS_FPN(
            in_channels=tuple(nk.get("in_channels", (256, 512, 1024, 2048))),
            out_channels=nk.get("out_channels", 256),
            num_outs=nk.get("num_outs", 5),
            start_level=nk.get("start_level", 1),
            dtype=dt, name="neck")
        bh = dict(self.bbox_head)
        self.num_classes = bh.get("num_classes", 1)
        self.strides = tuple(bh.get("strides", (8, 16, 32, 64, 128)))
        self.regress_ranges = tuple(
            tuple(r) for r in bh.get("regress_ranges",
                                     ((-1, 64), (64, 128), (128, 256),
                                      (256, 512), (512, INF_RANGE))))
        if bh.get("type") == "FCOSHead":
            # nas_fcos_fcoshead_* configs: searched FPN + the standard
            # FCOS conv towers (reference configs/nas_fcos/
            # nas_fcos_fcoshead_r50_caffe_fpn_gn-head_4x4_1x_coco.py)
            from ..dense_heads.fcos_head import FCOSHead
            self.head_m = FCOSHead(
                num_classes=self.num_classes,
                in_channels=bh.get("in_channels", 256),
                feat_channels=bh.get("feat_channels", 256),
                stacked_convs=bh.get("stacked_convs", 4),
                num_levels=nk.get("num_outs", 5),
                centerness_on_reg=bh.get("centerness_on_reg", False),
                dtype=dt, name="bbox_head")
        else:
            self.head_m = NASFCOSHead(
                num_classes=self.num_classes,
                in_channels=bh.get("in_channels", 256),
                feat_channels=bh.get("feat_channels", 256),
                num_levels=nk.get("num_outs", 5),
                centerness_on_reg=bh.get("centerness_on_reg", False),
                dtype=dt, name="bbox_head")
        lc = dict(bh.get("loss_cls", {}))
        self.focal_gamma = lc.get("gamma", 2.0)
        self.focal_alpha = lc.get("alpha", 0.25)
        # FCOS variant axes (fixed off in the searched NAS-FCOS head)
        self.center_sampling = bool(bh.get("center_sampling", False))
        self.center_sample_radius = float(bh.get("center_sample_radius",
                                                 1.5))
        self.norm_on_bbox = False
        self.bbox_loss_mode = "iou"
