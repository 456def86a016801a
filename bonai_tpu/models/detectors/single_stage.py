"""Single-stage detector (RetinaNet family).

reference: ``mmdet/models/detectors/single_stage.py`` +
``mmdet/models/detectors/retinanet.py``.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

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
        dt = _dtype(self.compute_dtype)
        bk = dict(self.backbone)
        bk.pop("type", None)
        self.backbone_m = ResNet(
            depth=bk.get("depth", 50),
            out_indices=tuple(bk.get("out_indices", (0, 1, 2, 3))),
            frozen_stages=bk.get("frozen_stages", -1), dtype=dt,
            name="backbone")
        nk = dict(self.neck)
        nk.pop("type", None)
        self.neck_m = FPN(
            in_channels=tuple(nk.get("in_channels", (256, 512, 1024, 2048))),
            out_channels=nk.get("out_channels", 256),
            num_outs=nk.get("num_outs", 5),
            start_level=nk.get("start_level", 1),
            add_extra_convs=bool(nk.get("add_extra_convs", False)),
            dtype=dt, name="neck")
        bh = dict(self.bbox_head)
        ag = dict(bh.get("anchor_generator", dict(
            octave_base_scale=4, scales_per_octave=3,
            ratios=[0.5, 1.0, 2.0], strides=[8, 16, 32, 64, 128])))
        ag.pop("type", None)
        self.anchor_generator = AnchorGenerator(**ag)
        self.num_classes = bh.get("num_classes", 80)
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

    def extract_feat(self, img):
        return self.neck_m(self.backbone_m(img))

    def __call__(self, img):
        return self.head_m(self.extract_feat(img))

    def _anchors(self, feats):
        sizes = [(int(f.shape[1]), int(f.shape[2])) for f in feats]
        return [jnp.asarray(a)
                for a in self.anchor_generator.grid_anchors(sizes)]

    def forward_train(self, batch):
        feats = self.extract_feat(batch["image"])
        cls_scores, bbox_preds = self.head_m(feats)
        anchors_flat = jnp.concatenate(self._anchors(feats), axis=0)
        return retina_loss(cls_scores, bbox_preds, anchors_flat,
                           batch["gt_bboxes"], batch["gt_valid"],
                           batch["gt_labels"], self.num_classes,
                           dict(self.train_cfg), gamma=self.focal_gamma,
                           alpha=self.focal_alpha)

    def simple_test(self, img, img_shape, scale_factor):
        feats = self.extract_feat(img)
        cls_scores, bbox_preds = self.head_m(feats)
        anchors = self._anchors(feats)
        cfg = dict(self.test_cfg)
        det_boxes, det_scores, det_labels, det_valid = jax.vmap(
            lambda cs, bp, ishape: retina_bboxes_single(
                cs, bp, anchors, ishape, self.num_classes, cfg)
        )([s for s in cls_scores], [b for b in bbox_preds], img_shape)
        return {"det_bboxes": det_boxes / jnp.asarray(
                    scale_factor)[:, None, None],
                "det_scores": det_scores, "det_labels": det_labels,
                "det_valid": det_valid}
