"""Two-stage detector (Faster/Mask R-CNN trunk) as a single jittable module.

reference: ``mmdet/models/detectors/two_stage.py:17-211``,
``mmdet/models/roi_heads/standard_roi_head.py:10-290``,
``mmdet/models/roi_heads/bbox_heads/bbox_head.py:141-225``,
``mmdet/models/roi_heads/mask_heads/fcn_mask_head.py:128-150``.

The reference's runner/hook machinery and per-image python loops collapse
into two pure methods — ``forward_train`` (the whole loss graph) and
``simple_test`` — built from batched masked ops with static shapes, so the
entire step compiles to one XLA program.  Batch layout contract (produced by
the data pipeline):

  image       (B, H, W, 3)   normalised, padded
  img_shape   (B, 2)         resized (pre-pad) h, w — used for clipping
  gt_bboxes   (B, G, 4)      padded with zeros
  gt_labels   (B, G) int32
  gt_valid    (B, G) bool
  gt_masks    (B, G, M, M)   instance-local (cropped-to-box) masks
  gt_offsets  (B, G, 2)      roof→footprint vectors (LOFT)
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors import AnchorGenerator
from ...core.assigners import max_iou_assign
from ...core.boxes import delta2bbox, clip_boxes
from ...core.masks import mask_targets_from_instance_masks
from ...core.nms import multiclass_nms
from ...core.samplers import random_sample
from ...ops.roi_align import multilevel_roi_align, prepare_flat_levels
from ..backbones.resnet import ResNet
from ..dense_heads.rpn_head import (RPNHead, rpn_loss, rpn_proposals_single)
from ..losses import (binary_cross_entropy, cross_entropy, l1_loss,
                      mse_loss, smooth_l1_loss, build_loss)
from ..necks.fpn import FPN
from ..roi_heads.bbox_head import Shared2FCBBoxHead, bbox_targets_single
from ..roi_heads.mask_head import FCNMaskHead


def _dtype(name):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


class GroieConvModule(nn.Module):
    """GRoIE pre/post ConvModule plugin (reference groie configs'
    ``pre_cfg=dict(type='ConvModule', kernel_size=5, padding=2)``):
    conv + ReLU, shared across pyramid levels."""
    features: int = 256
    kernel: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=[(pad, pad), (pad, pad)], dtype=self.dtype,
                    name="conv")(x)
        return nn.relu(x)


def assign_rcnn(proposals, proposal_valid, gt_bboxes, gt_valid,
                assigner_cfg):
    """Single-image second-stage assignment with ``add_gt_as_proposals``
    (gt boxes join the candidate pool; their self-IoU of 1 makes them
    positives).  reference: ``standard_roi_head.py:70-104``."""
    cand = jnp.concatenate([gt_bboxes, proposals], axis=0)
    cand_valid = jnp.concatenate([gt_valid, proposal_valid], axis=0)
    assigned, max_ov = max_iou_assign(
        cand, gt_bboxes, gt_valid,
        pos_iou_thr=assigner_cfg.get("pos_iou_thr", 0.5),
        neg_iou_thr=assigner_cfg.get("neg_iou_thr", 0.5),
        min_pos_iou=assigner_cfg.get("min_pos_iou", 0.5),
        match_low_quality=assigner_cfg.get("match_low_quality", True),
        box_valid=cand_valid)
    return cand, cand_valid, assigned, max_ov


def assign_and_sample_rcnn(rng, proposals, proposal_valid, gt_bboxes,
                           gt_valid, assigner_cfg, sampler_cfg,
                           dyn_iou_topk=None):
    """Single-image assign + sample (reference
    ``standard_roi_head.py:70-104`` + ``base_sampler.py`` sample()).
    Dispatches on the sampler type (Random / IoUBalancedNeg /
    InstanceBalancedPos); the loss-ranked samplers (OHEM, ScoreHLR) need
    head context and live in ``TwoStageDetector._hard_mining_sample``.
    Returns the sample dict plus the sampled candidate boxes ``(num, 4)``.
    """
    cand, cand_valid, assigned, max_ov = assign_rcnn(
        proposals, proposal_valid, gt_bboxes, gt_valid, assigner_cfg)
    stat_kth_iou = None
    if dyn_iou_topk is not None:
        # Dynamic R-CNN IoU statistic (reference
        # ``dynamic_roi_head.py:73-80``): the iou_topk-th largest
        # proposal IoU of this image (gt self-matches excluded — the
        # reference records it before gts join the pool)
        n_gt = gt_bboxes.shape[0]
        prop_ov = jnp.where(proposal_valid, max_ov[n_gt:], 0.0)
        k = min(int(dyn_iou_topk), prop_ov.shape[0])
        stat_kth_iou = jax.lax.top_k(prop_ov, k)[0][-1]
    num = sampler_cfg.get("num", 512)
    pos_fraction = sampler_cfg.get("pos_fraction", 0.25)
    neg_pos_ub = sampler_cfg.get("neg_pos_ub", -1)
    stype = sampler_cfg.get("type", "RandomSampler")
    if stype == "IoUBalancedNegSampler":
        from ...core.samplers import iou_balanced_neg_sample
        res = iou_balanced_neg_sample(
            rng, assigned, max_ov, num, pos_fraction,
            floor_thr=sampler_cfg.get("floor_thr", -1),
            floor_fraction=sampler_cfg.get("floor_fraction", 0.0),
            num_bins=sampler_cfg.get("num_bins", 3),
            neg_pos_ub=neg_pos_ub)
    elif stype == "InstanceBalancedPosSampler":
        from ...core.samplers import instance_balanced_pos_sample
        res = instance_balanced_pos_sample(rng, assigned, num, pos_fraction,
                                           neg_pos_ub=neg_pos_ub)
    elif stype == "CombinedSampler":
        # reference combined_sampler.py + libra_rcnn COCO configs
        from ...core.samplers import combined_sample
        res = combined_sample(rng, assigned, max_ov, num, pos_fraction,
                              pos_cfg=sampler_cfg.get("pos_sampler"),
                              neg_cfg=sampler_cfg.get("neg_sampler"),
                              neg_pos_ub=neg_pos_ub)
    else:
        res = random_sample(rng, assigned, num=num,
                            pos_fraction=pos_fraction,
                            neg_pos_ub=neg_pos_ub)
    if stat_kth_iou is not None:
        res["stat_kth_iou"] = stat_kth_iou
    sampled_boxes = cand[res["inds"]]
    return res, sampled_boxes


def boxes_to_rois(boxes, valid=None):
    """(B, N, 4) -> (B*N, 5) with leading batch index."""
    b, n = boxes.shape[:2]
    idx = jnp.repeat(jnp.arange(b, dtype=boxes.dtype), n)[:, None]
    rois = jnp.concatenate([idx, boxes.reshape(b * n, 4)], axis=1)
    if valid is None:
        return rois
    return rois, valid.reshape(b * n)


class TwoStageDetector(nn.Module):
    """Config-driven Faster/Mask R-CNN.  Subclasses add extra branches."""
    backbone: Any = None
    neck: Any = None
    rpn_head: Any = None
    roi_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    pretrained: Optional[str] = None
    compute_dtype: str = "float32"
    roi_align_impl: Optional[str] = None   # model-wide default for
                                           # extractor cfgs without 'impl'

    # ---------------- module construction ----------------
    def setup(self):
        from .builders import build_backbone_m, build_neck_m
        dt = _dtype(self.compute_dtype)
        self.backbone_m = build_backbone_m(self.backbone, dt)
        if self.neck is None:
            # C4-style detectors (reference rpn_r50_caffe_c4): dense head
            # runs directly on the backbone output
            self.neck_m = None
            self.neck_extra_ms = ()
            nk = {}
        elif isinstance(self.neck, (list, tuple)):
            # chained necks, e.g. [FPN, BFP] (Libra R-CNN, reference
            # configs/libra_rcnn/*: neck is a list)
            nk = dict(self.neck[0])
            extras = []
            for j, ecfg in enumerate(self.neck[1:]):
                ecfg = dict(ecfg)
                etype = ecfg.pop("type", "BFP")
                assert etype == "BFP", f"unsupported chained neck {etype}"
                from ..necks.bfp import BFP
                extras.append(BFP(
                    in_channels=ecfg.get("in_channels", 256),
                    num_levels=ecfg.get("num_levels", 5),
                    refine_level=ecfg.get("refine_level", 2),
                    refine_type=ecfg.get("refine_type"),
                    dtype=dt, name=f"neck_extra{j}"))
            self.neck_extra_ms = tuple(extras)
        else:
            nk = dict(self.neck)
            self.neck_extra_ms = ()
        if self.neck is not None:
            self.neck_m = build_neck_m(nk, dt)
        # Fast R-CNN (reference fast_rcnn.py / _base_/models/
        # fast_rcnn_r50_fpn.py) ships no RPN at all — proposals are
        # external inputs
        rh = dict(self.rpn_head or {})
        self.has_rpn = self.rpn_head is not None
        # SemiRPNHead (reference mmdet/models/dense_heads/semi_rpn_head.py):
        # footprint-only images supervise the RPN with footprint boxes
        self.semi_rpn = rh.get("type", "RPNHead") == "SemiRPNHead"
        self.ga_rpn = rh.get("type", "RPNHead") == "GARPNHead"
        if self.ga_rpn:
            # Guided Anchoring RPN (reference ga_rpn_head.py)
            from ..dense_heads.ga_rpn_head import GARPNHead
            assert not self.semi_rpn
            ag_cfg = dict(rh.get("approx_anchor_generator", {}))
            self.ga_strides = [s if isinstance(s, (int, float)) else s[0]
                               for s in ag_cfg.get(
                                   "strides", [4, 8, 16, 32, 64])]
            self.ga_octave_base_scale = ag_cfg.get("octave_base_scale", 8)
            self.ga_scales_per_octave = ag_cfg.get("scales_per_octave", 3)
            self.ga_ratios = tuple(ag_cfg.get("ratios", (0.5, 1.0, 2.0)))
            self.ga_loc_filter_thr = rh.get("loc_filter_thr", 0.01)
            self.rpn_head_m = GARPNHead(
                in_channels=rh.get("in_channels", 256),
                feat_channels=rh.get("feat_channels", 256),
                dtype=dt, name="rpn_head")
            self.anchor_generator = None
        elif not self.has_rpn:
            self.rpn_head_m = None
            self.anchor_generator = None
        else:
            ag_cfg = dict(rh.get("anchor_generator", {}))
            ag_type = ag_cfg.pop("type", "AnchorGenerator")
            if ag_type == "LegacyAnchorGenerator":
                # legacy_1.x family (reference anchor_generator.py:475)
                from ...core.anchors import LegacyAnchorGenerator
                self.anchor_generator = LegacyAnchorGenerator(**ag_cfg)
            else:
                self.anchor_generator = AnchorGenerator(**ag_cfg)
            self.rpn_head_m = RPNHead(
                in_channels=rh.get("in_channels", 256),
                feat_channels=rh.get("feat_channels", 256),
                num_anchors=len(ag_cfg.get("ratios", [0.5, 1.0, 2.0]))
                * len(ag_cfg.get("scales", [8])),
                dtype=dt, name="rpn_head")
        self.rpn_bbox_coder = rh.get("bbox_coder", {})
        # v1.x +1 box-size convention (legacy_1.x configs)
        self.rpn_legacy = self.rpn_bbox_coder.get(
            "type") == "LegacyDeltaXYWHBBoxCoder"
        if self.roi_head is None:
            # RPN-only detector (reference mmdet/models/detectors/rpn.py)
            self.bbox_head_m = None
            self.mask_head_m = None
            self.mask_iou_head_m = None
            self.shared_head_m = None
            self.double_head = False
            self.bbox_with_reg = True
        else:
            self._setup_roi_head(dt)

    def _setup_roi_head(self, dt):
        cfg = dict(self.roi_head)
        bh = dict(cfg["bbox_head"])
        if bh.get("type", "Shared2FCBBoxHead") == "DoubleConvFCBBoxHead":
            # Double-Head R-CNN (reference double_roi_head.py)
            from ..roi_heads.bbox_head import DoubleConvFCBBoxHead
            self.bbox_head_m = DoubleConvFCBBoxHead(
                num_classes=bh.get("num_classes", 1),
                num_convs=bh.get("num_convs", 4),
                num_fcs=bh.get("num_fcs", 2),
                in_channels=bh.get("in_channels", 256),
                conv_out_channels=bh.get("conv_out_channels", 1024),
                fc_out_channels=bh.get("fc_out_channels", 1024),
                reg_class_agnostic=bh.get("reg_class_agnostic", False),
                dtype=dt, name="bbox_head")
            self.double_head = True
            self.reg_roi_scale_factor = cfg.get("reg_roi_scale_factor",
                                                1.3)
        else:
            btype = bh.get("type", "Shared2FCBBoxHead")
            # Shared4Conv1FCBBoxHead (reference convfc_bbox_head.py:194-211,
            # the gn / gn+ws families): 4 shared convs + 1 shared fc;
            # plain BBoxHead (C4 configs): no convs/fcs, avg-pool + linear
            if btype == "Shared4Conv1FCBBoxHead":
                shared_convs, shared_fcs = 4, 1
            elif btype == "BBoxHead":
                shared_convs, shared_fcs = 0, 0
            else:
                shared_convs = bh.get("num_shared_convs", 0)
                shared_fcs = bh.get("num_shared_fcs", 2)
            self.bbox_head_m = Shared2FCBBoxHead(
                num_classes=bh.get("num_classes", 1),
                in_channels=bh.get("in_channels", 256),
                fc_out_channels=bh.get("fc_out_channels", 1024),
                roi_feat_size=bh.get("roi_feat_size", 7),
                reg_class_agnostic=bh.get("reg_class_agnostic", False),
                with_reg=bh.get("with_reg", True),
                num_shared_convs=shared_convs,
                num_shared_fcs=shared_fcs,
                conv_out_channels=bh.get("conv_out_channels", 256),
                with_avg_pool=bh.get("with_avg_pool", False),
                norm_cfg=bh.get("norm_cfg"),
                conv_cfg=bh.get("conv_cfg"),
                dtype=dt, name="bbox_head")
            self.double_head = False
        self.bbox_with_reg = bh.get("with_reg", True)
        lb = dict(bh.get("loss_bbox") or {})
        # non-default regression losses dispatch through the registry
        # (Libra BalancedL1Loss etc.); the L1/SmoothL1 defaults keep the
        # fused inline path
        self.bbox_loss_cfg = lb if lb.get("type") not in (
            None, "L1Loss", "SmoothL1Loss") else None
        self.reg_decoded_bbox = bh.get("reg_decoded_bbox", False)
        self.bbox_coder_cfg = bh.get(
            "bbox_coder", dict(target_means=[0.] * 4, target_stds=[1.] * 4))
        self.bbox_extractor_cfg = self._setup_extractor(
            dict(cfg["bbox_roi_extractor"]), "bbox", dt)
        sh = cfg.get("shared_head")
        if sh is not None:
            # C4 shared res5 head (reference shared_heads/res_layer.py)
            from ..backbones.resnet import ResLayerSharedHead
            sh = dict(sh)
            assert sh.get("type", "ResLayer") == "ResLayer"
            self.shared_head_m = ResLayerSharedHead(
                depth=sh.get("depth", 50),
                stage=sh.get("stage", 3),
                stride=sh.get("stride", 2),
                dilation=sh.get("dilation", 1),
                style=sh.get("style", "caffe"),
                norm_cfg=sh.get("norm_cfg"),
                dtype=dt, name="shared_head")
        else:
            self.shared_head_m = None
        if cfg.get("mask_head") is not None:
            mh = dict(cfg["mask_head"])
            if mh.get("type", "FCNMaskHead") == "CoarseMaskHead":
                # PointRend coarse stage (reference coarse_mask_head.py)
                from ..roi_heads.point_head import CoarseMaskHead
                self.mask_head_m = CoarseMaskHead(
                    num_convs=mh.get("num_convs", 0),
                    num_fcs=mh.get("num_fcs", 2),
                    in_channels=mh.get("in_channels", 256),
                    conv_out_channels=mh.get("conv_out_channels", 256),
                    fc_out_channels=mh.get("fc_out_channels", 1024),
                    num_classes=mh.get("num_classes", 1),
                    roi_feat_size=mh.get("roi_feat_size", 14),
                    dtype=dt, name="mask_head")
            else:
                up_cfg = dict(mh.get("upsample_cfg") or {})
                self.mask_head_m = FCNMaskHead(
                    num_convs=mh.get("num_convs", 4),
                    in_channels=mh.get("in_channels", 256),
                    conv_out_channels=mh.get("conv_out_channels", 256),
                    num_classes=mh.get("num_classes", 1),
                    norm_cfg=mh.get("norm_cfg"),
                    conv_cfg=mh.get("conv_cfg"),
                    upsample_type=up_cfg.get("type", "deconv"),
                    upsample_cfg=up_cfg,
                    dtype=dt, name="mask_head")
            # C4 mask branch has NO extractor of its own: it reuses the
            # bbox branch's res5 features (reference standard_roi_head.py
            # _mask_forward share_roi_extractor path)
            self.mask_extractor_cfg = (
                self._setup_extractor(dict(cfg["mask_roi_extractor"]),
                                      "mask", dt)
                if cfg.get("mask_roi_extractor") is not None else None)
        else:
            self.mask_head_m = None
        if cfg.get("mask_iou_head") is not None:
            # Mask Scoring R-CNN (reference mask_scoring_roi_head.py)
            from ..roi_heads.mask_head import MaskIoUHead
            mi = dict(cfg["mask_iou_head"])
            self.mask_iou_head_m = MaskIoUHead(
                num_convs=mi.get("num_convs", 4),
                num_fcs=mi.get("num_fcs", 2),
                in_channels=mi.get("in_channels", 256),
                conv_out_channels=mi.get("conv_out_channels", 256),
                fc_out_channels=mi.get("fc_out_channels", 1024),
                num_classes=mi.get("num_classes", 1),
                dtype=dt, name="mask_iou_head")
            self.mask_iou_loss_weight = dict(mi.get(
                "loss_iou", {})).get("loss_weight", 0.5)
        else:
            self.mask_iou_head_m = None

    def _setup_extractor(self, ext, role, dt):
        """Build GRoIE pre/post plugin modules for a GenericRoIExtractor
        cfg (reference ``generic_roi_extractor.py:36-40``; groie configs).
        The module attribute names are stashed into the cfg dict so
        ``_roi_align_cfg`` can look them up at call time."""
        lt = dict(ext.get("roi_layer") or {}).get("type", "RoIAlign")
        if lt in ("DeformRoIPoolPack", "DeformRoIPoolingPack",
                  "ModulatedDeformRoIPoolPack",
                  "ModulatedDeformRoIPoolingPack"):
            # dpool / mdpool bbox extractors (reference configs/dcn/
            # faster_rcnn_r50_fpn_{dpool,mdpool}_1x_coco.py)
            from ...ops.roi_pool import DeformRoIPoolPack
            layer = dict(ext["roi_layer"])
            mod = DeformRoIPoolPack(
                output_size=layer.get("output_size", 7),
                output_channels=layer.get("output_channels", 256),
                deform_fc_channels=layer.get("deform_fc_channels", 1024),
                gamma=layer.get("gamma", 0.1),
                modulated=lt.startswith("Modulated"),
                dtype=dt, name=f"{role}_dpool")
            setattr(self, f"_dpool_{role}", mod)
            ext["_dpool_attr"] = f"_dpool_{role}"
            return ext
        if ext.get("type") != "GenericRoIExtractor":
            return ext
        pre = dict(ext.get("pre_cfg") or {})
        if pre:
            assert pre.get("type", "ConvModule") == "ConvModule", \
                f"unsupported groie pre module {pre.get('type')}"
            mod = GroieConvModule(
                features=pre.get("out_channels", 256),
                kernel=pre.get("kernel_size", 3),
                dtype=dt, name=f"{role}_groie_pre")
            setattr(self, f"_groie_pre_{role}", mod)
            ext["_pre_attr"] = f"_groie_pre_{role}"
        post = dict(ext.get("post_cfg") or {})
        if post:
            ptype = post.pop("type", "GeneralizedAttention")
            post.pop("in_channels", None)
            if ptype == "GeneralizedAttention":
                from ...ops.layers import GeneralizedAttention
                mod = GeneralizedAttention(dtype=dt,
                                           name=f"{role}_groie_post", **post)
            elif ptype == "ConvModule":
                post.pop("inplace", None)
                mod = GroieConvModule(
                    features=post.get("out_channels", 256),
                    kernel=post.get("kernel_size", 3),
                    dtype=dt, name=f"{role}_groie_post")
            else:
                raise KeyError(f"unsupported groie post module {ptype}")
            setattr(self, f"_groie_post_{role}", mod)
            ext["_post_attr"] = f"_groie_post_{role}"
        return ext

    # ---------------- shared helpers ----------------
    @property
    def with_mask(self):
        return self.mask_head_m is not None

    def extract_feat(self, img):
        feats = self.backbone_m(img)
        if self.neck_m is not None:
            feats = self.neck_m(feats)
        for extra in self.neck_extra_ms:
            feats = extra(feats)
        return feats

    def _roi_align_cfg(self, extractor_cfg, feats, rois, roi_valid,
                       flat_pack=None):
        layer = dict(extractor_cfg.get("roi_layer", {}))
        out_size = layer.get("output_size", 7)
        sr = layer.get("sampling_ratio", 0) or 2   # static grid on TPU
        strides = list(extractor_cfg.get("featmap_strides", [4, 8, 16, 32]))
        dpool_attr = extractor_cfg.get("_dpool_attr")
        if dpool_attr:
            from ...ops.roi_pool import multilevel_deform_roi_pool
            mod = getattr(self, dpool_attr)
            return multilevel_deform_roi_pool(
                feats[:len(strides)], rois,
                lambda f, r, ss: mod(f, r, ss), strides,
                roi_valid=roi_valid,
                finest_scale=extractor_cfg.get("finest_scale", 56))
        if layer.get("type", "RoIAlign") == "RoIPool":
            from ...ops.roi_pool import (multilevel_deform_roi_pool,
                                         roi_pool)
            return multilevel_deform_roi_pool(
                feats[:len(strides)], rois,
                lambda f, r, ss: roi_pool(f, r, out_size, ss, sr),
                strides, roi_valid=roi_valid,
                finest_scale=extractor_cfg.get("finest_scale", 56))
        if extractor_cfg.get("type") == "GenericRoIExtractor":
            from ...ops.roi_align import generic_roi_align
            pre_attr = extractor_cfg.get("_pre_attr")
            post_attr = extractor_cfg.get("_post_attr")
            return generic_roi_align(
                feats[:len(strides)], rois, out_size, strides,
                sampling_ratio=sr, roi_valid=roi_valid,
                aggregation=extractor_cfg.get("aggregation", "sum"),
                pre=getattr(self, pre_attr) if pre_attr else None,
                post=getattr(self, post_attr) if post_attr else None)
        # default = gather: the blocked variant's forward is faster but its
        # backward block-scatter serializes (~23GB/s) and loses end-to-end;
        # 'pallas' selects the fused strip kernel (pallas_roi_align_fused);
        # 'block' the one-rectangular-DMA-per-RoI successor
        # (pallas_roi_align_block) — fastest fwd AND bwd on hardware
        impl = extractor_cfg.get("impl", self.roi_align_impl or "gather")
        if impl in ("pallas", "block"):
            d = jax.devices()[0]
            if not ("TPU" in getattr(d, "device_kind", "")
                    or d.platform in ("tpu", "axon")):
                impl = "gather"   # Mosaic kernels only lower on TPU; the
                                  # gather path is semantics-equivalent
        extra = {}
        if impl == "blocked":
            from ...ops.roi_align_blocked import multilevel_roi_align_blocked
            fn = multilevel_roi_align_blocked
        elif impl == "pallas":
            from ...ops.pallas_roi_align_fused import (
                pallas_multilevel_roi_align)
            fn = pallas_multilevel_roi_align
            extra["backward"] = extractor_cfg.get("roi_backward", "rmw")
        elif impl == "block":
            import os
            from ...ops.pallas_roi_align_block import pallas_block_roi_align
            fn = pallas_block_roi_align
            # K-chain count of the RMW backward: more chains = more DMA
            # overlap but chains x level-size HBM partials (P2 is 67 MB
            # per chain at 1024^2 b=2); env knob for A/B benchmarking
            extra["chains"] = int(
                os.environ.get("BONAI_BLOCK_CHAINS")
                or extractor_cfg.get("roi_chains", 4))
        else:
            fn = multilevel_roi_align
        return fn(
            feats[:len(strides)], rois, out_size, strides,
            sampling_ratio=sr, roi_valid=roi_valid,
            finest_scale=extractor_cfg.get("finest_scale", 56),
            flat_pack=flat_pack, **extra)

    def _bbox_head_forward(self, feats, rois, roi_valid, flat_pack=None):
        """Shared bbox extraction + head call; Double-Head extracts the
        reg branch from center-scaled RoIs (reference
        ``double_roi_head.py:16-27`` ``reg_roi_scale_factor``)."""
        bf = self._roi_align_cfg(self.bbox_extractor_cfg, feats, rois,
                                 roi_valid, flat_pack=flat_pack)
        if self.shared_head_m is not None:
            bf = self.shared_head_m(bf)
        if getattr(self, "double_head", False):
            from ..roi_heads.bbox_head import scale_rois
            rf = self._roi_align_cfg(
                self.bbox_extractor_cfg, feats,
                scale_rois(rois, self.reg_roi_scale_factor), roi_valid,
                flat_pack=flat_pack)
            if self.shared_head_m is not None:
                rf = self.shared_head_m(rf)
            return self.bbox_head_m(bf, rf)
        return self.bbox_head_m(bf)

    def _mask_roi_feats(self, feats, rois, roi_valid, flat_pack=None):
        """Mask-branch RoI features.  C4 (no mask extractor): bbox
        extractor + shared res5 head, exactly the features the bbox head
        saw (reference _mask_forward share_roi_extractor)."""
        if self.mask_extractor_cfg is None:
            mf = self._roi_align_cfg(self.bbox_extractor_cfg, feats, rois,
                                     roi_valid, flat_pack=flat_pack)
            return self.shared_head_m(mf) \
                if self.shared_head_m is not None else mf
        return self._roi_align_cfg(self.mask_extractor_cfg, feats, rois,
                                   roi_valid, flat_pack=flat_pack)

    def _flat_pack(self, feats):
        strides = list(self.bbox_extractor_cfg.get("featmap_strides",
                                                   [4, 8, 16, 32]))
        return prepare_flat_levels(feats[:len(strides)])

    def _rpn_and_proposals(self, feats, img_shape, proposal_cfg):
        if getattr(self, "ga_rpn", False):
            return self._ga_rpn_and_proposals(feats, img_shape,
                                              proposal_cfg)
        cls_scores, bbox_preds = self.rpn_head_m(feats)
        if getattr(self, "rpn_legacy", False):
            proposal_cfg = dict(proposal_cfg, legacy_coder=True)
        sizes = [(int(f.shape[1]), int(f.shape[2])) for f in feats]
        anchors_levels = [jnp.asarray(a) for a in
                          self.anchor_generator.grid_anchors(sizes)]
        props, scores, valid = jax.vmap(
            lambda cs, bp, ishape: rpn_proposals_single(
                cs, bp, anchors_levels, ishape, proposal_cfg)
        )([s for s in cls_scores], [b for b in bbox_preds], img_shape)
        return cls_scores, bbox_preds, anchors_levels, props, scores, valid

    def _ga_rpn_and_proposals(self, feats, img_shape, proposal_cfg):
        """GA-RPN forward + proposals.  Returns the same 6-slot tuple as
        the plain path; slot 0 carries (cls, reg, shape, loc) and slot 2
        the square anchors (consumed by the GA loss branch)."""
        from ..dense_heads.ga_rpn_head import (ga_proposals_single,
                                               square_anchors)
        cls_scores, bbox_preds, shape_preds, loc_preds = \
            self.rpn_head_m(feats)
        sizes = [(int(f.shape[1]), int(f.shape[2])) for f in feats]
        squares = [jnp.asarray(s) for s in square_anchors(
            sizes, self.ga_strides, self.ga_octave_base_scale)]
        props, scores, valid = jax.vmap(
            lambda cs, bp, sp, lp, ishape: ga_proposals_single(
                cs, bp, sp, lp, squares, ishape, proposal_cfg,
                loc_filter_thr=self.ga_loc_filter_thr)
        )([s for s in cls_scores], [b for b in bbox_preds],
          [s for s in shape_preds], [l for l in loc_preds], img_shape)
        return ((cls_scores, bbox_preds, shape_preds, loc_preds), None,
                squares, props, scores, valid)

    # ---------------- init path ----------------
    def __call__(self, img):
        """forward_dummy: touches every parameterised submodule once so
        ``init`` creates the full tree (reference ``two_stage.py:87-103``)."""
        feats = self.extract_feat(img)
        outs = (self.rpn_head_m(feats) if self.rpn_head_m is not None
                else None)                   # Fast R-CNN: no RPN
        if self.bbox_head_m is None:         # RPN-only detector
            return outs
        rois = jnp.tile(jnp.asarray([[0., 0., 0., 32., 32.]]), (4, 1))
        strides = list(self.bbox_extractor_cfg.get(
            "featmap_strides", [4, 8, 16, 32]))
        extra = [self._bbox_head_forward(feats, rois, None)]
        if self.with_mask:
            mf = self._mask_roi_feats(feats, rois, None)
            ml = self.mask_head_m(mf)
            extra.append(ml)
            if self.mask_iou_head_m is not None:
                extra.append(self.mask_iou_head_m(mf, ml))
        extra += self._dummy_extra_heads(feats, rois)
        return outs, extra

    def _dummy_extra_heads(self, feats, rois):
        return []

    # ---------------- training ----------------
    def forward_train(self, batch):
        img = batch["image"]
        img_shape = batch["img_shape"]
        gt_bboxes = batch["gt_bboxes"]
        gt_valid = batch["gt_valid"]
        rng = self.make_rng("sampling")
        rng_rpn, rng_rcnn = jax.random.split(rng)

        feats = self.extract_feat(img)
        img_losses, img_aux = self._image_level_train(feats, batch)
        proposal_cfg = dict(self.train_cfg.get("rpn_proposal", {}))
        (cls_scores, bbox_preds, anchors_levels, proposals, _,
         prop_valid) = self._rpn_and_proposals(feats, img_shape, proposal_cfg)

        if getattr(self, "ga_rpn", False):
            from ..dense_heads.ga_rpn_head import (approx_anchors,
                                                   ga_rpn_loss)
            sizes = [(int(f.shape[1]), int(f.shape[2])) for f in feats]
            approxs = [jnp.asarray(a) for a in approx_anchors(
                sizes, self.ga_strides, self.ga_octave_base_scale,
                self.ga_scales_per_octave, self.ga_ratios)]
            cls_s, reg_s, shape_s, loc_s = cls_scores
            losses = ga_rpn_loss(
                cls_s, reg_s, shape_s, loc_s, anchors_levels, approxs,
                gt_bboxes, gt_valid, rng_rpn,
                dict(self.train_cfg["rpn"]), self.ga_strides,
                self.ga_octave_base_scale, sizes)
            losses.update(img_losses)
            proposals = jax.lax.stop_gradient(proposals)
            losses.update(self._roi_forward_train(
                feats, proposals, prop_valid, batch, rng_rcnn))
            return losses

        anchors_flat = jnp.concatenate(anchors_levels, axis=0)
        rpn_gt = gt_bboxes
        rpn_reg_weight = None
        if self.semi_rpn and "gt_footprint_bboxes" in batch:
            flag = batch.get("gt_only_footprint_flag",
                             jnp.zeros(gt_bboxes.shape[0]))
            rpn_gt = jnp.where(flag[:, None, None] > 0.5,
                               batch["gt_footprint_bboxes"], gt_bboxes)
            # footprint-only images supervise RPN cls but NOT reg
            # (reference semi_rpn_head.py:146 ``bbox_weights[pos] = 1 -
            # flag``) — unless the angle head predicts near-nadir (<10°),
            # where footprint≈roof and reg is re-enabled
            # (semi_rpn_head.py:51-60).
            if "angle_pred" in img_aux:
                deg = jnp.abs(img_aux["angle_pred"][:, 0]) * (180.0 / jnp.pi)
                flag = flag * (deg >= 10.0).astype(flag.dtype)
            rpn_reg_weight = 1.0 - flag
        losses = rpn_loss(
            cls_scores, bbox_preds, anchors_flat, rpn_gt, gt_valid,
            rng_rpn,
            dict(self.train_cfg["rpn"],
                 legacy_coder=getattr(self, "rpn_legacy", False)),
            reg_weight=rpn_reg_weight)
        losses.update(img_losses)

        if self.bbox_head_m is None:        # RPN-only detector
            return losses
        proposals = jax.lax.stop_gradient(proposals)
        losses.update(self._roi_forward_train(
            feats, proposals, prop_valid, batch, rng_rcnn))
        return losses

    def _roi_forward_train(self, feats, proposals, prop_valid, batch, rng):
        gt_bboxes = batch["gt_bboxes"]
        gt_valid = batch["gt_valid"]
        gt_labels = batch["gt_labels"]
        b = gt_bboxes.shape[0]
        rcnn = dict(self.train_cfg["rcnn"])
        sampler_cfg = dict(rcnn["sampler"])
        num = sampler_cfg.get("num", 512)
        num_pos = int(num * sampler_cfg.get("pos_fraction", 0.25))

        # Dynamic R-CNN (reference ``dynamic_roi_head.py``): the host
        # loop feeds the current IoU threshold / SmoothL1 beta as traced
        # scalars and reads back the batch statistics from the metrics
        dyn_cfg = rcnn.get("dynamic_rcnn")
        assigner_cfg = dict(rcnn["assigner"])
        dyn_iou_topk = None
        if dyn_cfg is not None:
            thr = batch.get("dyn_iou_thr")
            if thr is not None:
                assigner_cfg["pos_iou_thr"] = thr
                assigner_cfg["neg_iou_thr"] = thr
                assigner_cfg["min_pos_iou"] = thr
            dyn_iou_topk = int(dyn_cfg.get("iou_topk", 75))

        flat_pack = self._flat_pack(feats)
        rngs = jax.random.split(rng, b)
        if sampler_cfg.get("type", "RandomSampler") in ("OHEMSampler",
                                                        "ScoreHLRSampler"):
            res, sampled_boxes = self._hard_mining_assign_and_sample(
                feats, proposals, prop_valid, batch, rcnn, sampler_cfg,
                flat_pack)
        else:
            res, sampled_boxes = jax.vmap(
                lambda r, p, pv, gb, gv: assign_and_sample_rcnn(
                    r, p, pv, gb, gv, assigner_cfg, sampler_cfg,
                    dyn_iou_topk=dyn_iou_topk)
            )(rngs, proposals, prop_valid, gt_bboxes, gt_valid)
        # res fields: (B, num); sampled_boxes: (B, num, 4)

        coder = dict(self.bbox_coder_cfg)
        legacy = coder.get("type") == "LegacyDeltaXYWHBBoxCoder"
        labels, label_w, bbox_t, bbox_w = jax.vmap(
            lambda sb, ip, v, pg, gb, gl: bbox_targets_single(
                sb, {"is_pos": ip, "valid": v, "pos_gt_inds": pg}, gb, gl,
                self.bbox_head_m.num_classes,
                tuple(coder.get("target_means", (0.,) * 4)),
                tuple(coder.get("target_stds", (1.,) * 4)), legacy=legacy)
        )(sampled_boxes, res["is_pos"], res["valid"], res["pos_gt_inds"],
          gt_bboxes, gt_labels)

        rois, roi_valid = boxes_to_rois(sampled_boxes, res["valid"])
        cls_score, bbox_pred = self._bbox_head_forward(
            feats, rois, roi_valid, flat_pack)

        n_tot = b * num
        labels_f = labels.reshape(n_tot)
        label_w_f = label_w.reshape(n_tot)
        if "neg_label_weights" in res:       # ScoreHLR ISR-N reweighting
            label_w_f = label_w_f * res["neg_label_weights"].reshape(n_tot)
        # reg: select the gt-class slice when not class-agnostic
        nc = self.bbox_head_m.num_classes
        if self.bbox_head_m.reg_class_agnostic or nc == 1:
            pred4 = bbox_pred.reshape(n_tot, -1)[:, :4]
        else:
            pred = bbox_pred.reshape(n_tot, nc, 4)
            pred4 = jnp.take_along_axis(
                pred, jnp.clip(labels_f, 0, nc - 1)[:, None, None], axis=1
            )[:, 0]
        bbox_t_f = bbox_t.reshape(n_tot, 4)
        pos_mask = labels_f < nc

        # PISA (reference mmdet/models/roi_heads/pisa_roi_head.py keyed
        # off train_cfg.rcnn isr/carl): reweight positive cls weights by
        # IoU-HLR before the loss; add the CARL regression term
        isr_cfg = rcnn.get("isr")
        carl_cfg = rcnn.get("carl")
        if isr_cfg or carl_cfg:
            from ...core.boxes import delta2bbox as _d2b
            coder_m = tuple(coder.get("target_means", (0.,) * 4))
            coder_s = tuple(coder.get("target_stds", (1.,) * 4))
            flat_boxes = sampled_boxes.reshape(n_tot, 4)
            dec_pred = _d2b(flat_boxes,
                            jax.lax.stop_gradient(pred4.astype(jnp.float32)),
                            coder_m, coder_s)
            dec_tgt = _d2b(flat_boxes, bbox_t_f, coder_m, coder_s)
            ix1 = jnp.maximum(dec_pred[:, 0], dec_tgt[:, 0])
            iy1 = jnp.maximum(dec_pred[:, 1], dec_tgt[:, 1])
            ix2 = jnp.minimum(dec_pred[:, 2], dec_tgt[:, 2])
            iy2 = jnp.minimum(dec_pred[:, 3], dec_tgt[:, 3])
            inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
            area = (lambda bx: jnp.clip(bx[:, 2] - bx[:, 0], 0)
                    * jnp.clip(bx[:, 3] - bx[:, 1], 0))
            ious = inter / jnp.maximum(
                area(dec_pred) + area(dec_tgt) - inter, 1e-6)
        if isr_cfg:
            from ..losses import isr_p
            logp = jax.nn.log_softmax(
                jax.lax.stop_gradient(cls_score.astype(jnp.float32)), -1)
            ce_raw = -jnp.take_along_axis(
                logp, jnp.clip(labels_f, 0, nc)[:, None], axis=1)[:, 0]
            # offset matched-gt ids per image (reference pisa_loss.py:
            # 47-56 "merge pos_assigned_gt_inds ... + last_max_gt") so
            # same-index instances of different images don't share an
            # IoU-HLR group
            n_gt = batch["gt_bboxes"].shape[1]
            gt_global = (res["pos_gt_inds"]
                         + jnp.arange(b)[:, None] * n_gt).reshape(n_tot)
            label_w_f = isr_p(
                label_w_f, ious, pos_mask, labels_f, gt_global,
                jnp.where(pos_mask, ce_raw, 0.0),
                k=isr_cfg.get("k", 2.0), bias=isr_cfg.get("bias", 0.0))

        avg_cls = jnp.maximum(jnp.sum(label_w_f > 0), 1.0)
        loss_cls = cross_entropy(cls_score, labels_f, label_w_f,
                                 avg_factor=avg_cls)
        if dyn_cfg is not None:
            beta = batch.get("dyn_beta", dyn_cfg.get("initial_beta", 1.0))
            loss_bbox = smooth_l1_loss(pred4, bbox_t_f, beta,
                                       bbox_w.reshape(n_tot, 4),
                                       avg_factor=float(n_tot))
        elif getattr(self, "bbox_loss_cfg", None):
            # config-dispatched regression loss (Libra R-CNN:
            # loss_bbox=dict(type='BalancedL1Loss', ...))
            if getattr(self, "reg_decoded_bbox", False):
                # reference bbox_head.py ``reg_decoded_bbox``: IoU-family
                # losses operate on decoded boxes; decoding the target
                # deltas recovers the matched gt box
                from ...core.boxes import delta2bbox as _d2b
                coder_m = tuple(coder.get("target_means", (0.,) * 4))
                coder_s = tuple(coder.get("target_stds", (1.,) * 4))
                flat_boxes = sampled_boxes.reshape(n_tot, 4)
                loss_bbox = build_loss(dict(self.bbox_loss_cfg))(
                    _d2b(flat_boxes, pred4.astype(jnp.float32),
                         coder_m, coder_s),
                    _d2b(flat_boxes, bbox_t_f, coder_m, coder_s),
                    bbox_w.reshape(n_tot, 4)[:, 0],
                    avg_factor=float(n_tot))
            else:
                loss_bbox = build_loss(dict(self.bbox_loss_cfg))(
                    pred4, bbox_t_f, bbox_w.reshape(n_tot, 4),
                    avg_factor=float(n_tot))
        else:
            loss_bbox = l1_loss(pred4, bbox_t_f, bbox_w.reshape(n_tot, 4),
                                avg_factor=float(n_tot))
        losses = {"loss_cls": loss_cls, "loss_bbox": loss_bbox}
        if not getattr(self, "bbox_with_reg", True):
            del losses["loss_bbox"]
        if dyn_cfg is not None:
            # beta statistic (reference ``dynamic_roi_head.py:118-126``):
            # the (beta_topk * B)-th smallest mean |dx, dy| over positives
            npos_tot = jnp.sum(pos_mask)
            tgt_xy = jnp.mean(jnp.abs(bbox_t_f[:, :2]), axis=1)
            masked = jnp.where(pos_mask, tgt_xy, jnp.inf)
            order = jnp.sort(masked)
            kk = jnp.minimum(int(dyn_cfg.get("beta_topk", 10)) * b,
                             npos_tot)
            kth = order[jnp.maximum(kk - 1, 0)]
            losses["stat_dyn_beta"] = jnp.where(npos_tot > 0, kth, -1.0)
            losses["stat_dyn_iou"] = jnp.mean(res["stat_kth_iou"]) \
                if "stat_kth_iou" in res else jnp.float32(0.0)
        if carl_cfg:
            from ..losses import carl_loss
            probs = jax.nn.softmax(cls_score.astype(jnp.float32), -1)
            pos_prob = jnp.take_along_axis(
                probs, jnp.clip(labels_f, 0, nc - 1)[:, None], axis=1)[:, 0]
            reg_raw = jnp.abs(pred4 - bbox_t_f)   # L1, unreduced
            losses["loss_carl"] = carl_cfg.get("loss_weight", 1.0) * \
                carl_loss(pos_prob, pos_mask, reg_raw,
                          k=carl_cfg.get("k", 1.0),
                          bias=carl_cfg.get("bias", 0.2),
                          avg_factor=float(n_tot))

        # ---- mask branch on the positive slots (sampler ranks pos first)
        pos_slots = slice(0, num_pos)
        pos_boxes = sampled_boxes[:, pos_slots]              # (B, P, 4)
        pos_is_pos = res["is_pos"][:, pos_slots]
        pos_gt = res["pos_gt_inds"][:, pos_slots]
        losses.update(self._mask_forward_train(
            feats, batch, rcnn, pos_boxes, pos_is_pos, pos_gt, flat_pack))
        losses.update(self._extra_forward_train(
            feats, batch, rcnn, pos_boxes, pos_is_pos, pos_gt, flat_pack))
        return losses

    def _hard_mining_assign_and_sample(self, feats, proposals, prop_valid,
                                       batch, rcnn, sampler_cfg, flat_pack):
        """Loss/score-ranked sampling needing head context.

        OHEM (reference ``mmdet/core/bbox/samplers/ohem_sampler.py``
        ``hard_mining``): rank candidates by a no-grad bbox-head
        classification loss (RoIAlign + head forward under
        ``torch.no_grad`` + ``loss.topk``).
        ScoreHLR (``score_hlr_sampler.py``): rank negatives by their max
        foreground softmax score and emit ISR-N label weights.
        """
        from ...core.samplers import ohem_sample, score_hlr_neg_sample
        gt_bboxes = batch["gt_bboxes"]
        gt_valid = batch["gt_valid"]
        gt_labels = batch["gt_labels"]
        b = gt_bboxes.shape[0]
        cand, cand_valid, assigned, _ = jax.vmap(
            lambda p, pv, gb, gv: assign_rcnn(
                p, pv, gb, gv, dict(rcnn["assigner"]))
        )(proposals, prop_valid, gt_bboxes, gt_valid)
        n_cand = cand.shape[1]

        rois, roi_valid = boxes_to_rois(cand, cand_valid)
        cls_score, _ = self._bbox_head_forward(feats, rois, roi_valid,
                                               flat_pack)
        cls_score = jax.lax.stop_gradient(
            cls_score.astype(jnp.float32))           # (B*N, nc+1)
        nc = self.bbox_head_m.num_classes
        bidx = jnp.arange(b)[:, None]

        if sampler_cfg.get("type") == "ScoreHLRSampler":
            probs = jax.nn.softmax(cls_score, axis=-1)
            max_fg = jnp.max(probs[:, :nc], axis=-1)
            max_fg = jnp.where(cand_valid.reshape(-1), max_fg,
                               0.0).reshape(b, n_cand)
            rngs = jax.random.split(self.make_rng("sampling"), b)
            res = jax.vmap(lambda r, s, a: score_hlr_neg_sample(
                r, a, s, num=sampler_cfg.get("num", 512),
                pos_fraction=sampler_cfg.get("pos_fraction", 0.25),
                score_thr=sampler_cfg.get("score_thr", 0.05),
                bias=sampler_cfg.get("bias", 0.0),
                k=sampler_cfg.get("k", 0.5),
                neg_pos_ub=sampler_cfg.get("neg_pos_ub", -1)))(
                rngs, max_fg, assigned)
        else:
            matched_labels = gt_labels[bidx, jnp.maximum(assigned - 1, 0)]
            cand_labels = jnp.where(assigned > 0, matched_labels, nc)
            logp = jax.nn.log_softmax(cls_score, axis=-1)
            ce = -jnp.take_along_axis(
                logp, cand_labels.reshape(-1, 1), axis=1)[:, 0]
            ce = jnp.where(cand_valid.reshape(-1), ce,
                           0.0).reshape(b, n_cand)
            res = jax.vmap(lambda l, a: ohem_sample(
                l, a, num=sampler_cfg.get("num", 512),
                pos_fraction=sampler_cfg.get("pos_fraction", 0.25),
                neg_pos_ub=sampler_cfg.get("neg_pos_ub", -1)))(ce, assigned)
        sampled_boxes = cand[bidx, res["inds"]]
        return res, sampled_boxes

    def _mask_forward_train(self, feats, batch, rcnn, pos_boxes, pos_is_pos,
                            pos_gt, flat_pack=None):
        if not self.with_mask:
            return {}
        b, p = pos_boxes.shape[:2]
        gt_bboxes = batch["gt_bboxes"]
        gt_masks = batch["gt_masks"]
        mask_size = rcnn.get("mask_size", 28)
        rois, roi_valid = boxes_to_rois(pos_boxes, pos_is_pos)
        mask_feats = self._mask_roi_feats(feats, rois, roi_valid,
                                          flat_pack=flat_pack)
        mask_logits = self.mask_head_m(mask_feats)           # (BP, 2S, 2S, C)

        bidx = jnp.arange(b)[:, None]
        matched_boxes = gt_bboxes[bidx, pos_gt].reshape(b * p, 4)
        matched_masks = gt_masks[bidx, pos_gt].reshape(
            b * p, *gt_masks.shape[-2:])
        targets = mask_targets_from_instance_masks(
            rois[:, 1:5], matched_boxes, matched_masks, mask_size)
        # single fg class -> channel 0; labels are always 0 for positives
        logits = mask_logits[..., 0]
        w = roi_valid.astype(jnp.float32)[:, None, None]
        loss_mask = binary_cross_entropy(
            logits, targets, jnp.broadcast_to(w, logits.shape),
            avg_factor=jnp.maximum(jnp.sum(w) * mask_size * mask_size, 1.0))
        losses = {"loss_mask": loss_mask}
        if self.mask_iou_head_m is not None:
            from ..roi_heads.mask_head import mask_iou_targets
            iou_pred = self.mask_iou_head_m(mask_feats, mask_logits)[:, 0]
            iou_t = mask_iou_targets(
                jax.lax.stop_gradient(logits), targets, rois[:, 1:5],
                matched_boxes, matched_masks,
                mask_thr=rcnn.get("mask_thr_binary", 0.5))
            # reference maskiou_head.loss: MSE on positives with
            # non-zero targets, weight loss_iou
            wi = roi_valid.astype(jnp.float32) * (iou_t > 0)
            losses["loss_mask_iou"] = self.mask_iou_loss_weight * \
                mse_loss(iou_pred, iou_t, wi,
                         avg_factor=jnp.maximum(jnp.sum(wi), 1.0))
        return losses

    def _extra_forward_train(self, feats, batch, rcnn, pos_boxes, pos_is_pos,
                             pos_gt, flat_pack=None):
        return {}

    def _image_level_train(self, feats, batch):
        """Hook for image-level auxiliary heads (e.g. the LOFT angle
        head).  Returns ``(losses, aux)``; ``aux`` may carry predictions
        consumed elsewhere in the step (``angle_pred`` gates the semi-RPN
        flag, reference ``semi_rpn_head.py:51-60``)."""
        return {}, {}

    # ---------------- inference ----------------
    def simple_test(self, img, img_shape, scale_factor):
        """Batched inference.  Returns padded, fixed-shape results.

        reference flow: ``two_stage.py:187-199`` → ``test_mixins.py:53-72``
        (bbox decode + soft-NMS) → mask/offset heads on detections.
        """
        feats = self.extract_feat(img)
        test_rpn = dict(self.test_cfg.get("rpn", {}))
        (_, _, _, proposals, prop_scores,
         prop_valid) = self._rpn_and_proposals(feats, img_shape, test_rpn)
        if self.bbox_head_m is None:
            # RPN-only detector: proposals ARE the detections
            # (reference rpn.py simple_test -> proposal list)
            return {"det_bboxes": proposals / jnp.asarray(
                        scale_factor)[:, None, None],
                    "det_scores": prop_scores,
                    "det_labels": jnp.zeros(prop_scores.shape, jnp.int32),
                    "det_valid": prop_valid}
        return self._rcnn_simple_test(feats, proposals, prop_valid,
                                      img_shape, scale_factor)

    def _rcnn_simple_test(self, feats, proposals, prop_valid, img_shape,
                          scale_factor):
        """Second-stage test on given proposals (shared by the standard
        path and FastRCNN's precomputed-proposal path)."""
        rcnn = dict(self.test_cfg["rcnn"])
        b, n = proposals.shape[:2]
        flat_pack = self._flat_pack(feats)
        rois, roi_valid = boxes_to_rois(proposals, prop_valid)
        cls_score, bbox_pred = self._bbox_head_forward(
            feats, rois, roi_valid, flat_pack)
        scores = jax.nn.softmax(cls_score, axis=-1).reshape(b, n, -1)
        coder = dict(self.bbox_coder_cfg)
        boxes_dec = jax.vmap(lambda r, d, s: delta2bbox(
            r, d, tuple(coder.get("target_means", (0.,) * 4)),
            tuple(coder.get("target_stds", (1.,) * 4)),
            legacy=coder.get("type") == "LegacyDeltaXYWHBBoxCoder"))(
            proposals, bbox_pred.reshape(b, n, -1), img_shape)
        boxes_dec = jax.vmap(clip_boxes)(boxes_dec, img_shape)

        max_per_img = rcnn.get("max_per_img", 100)
        nms_cfg = dict(rcnn.get("nms", dict(type="nms", iou_threshold=0.5)))
        det_boxes, det_scores, det_labels, det_valid = jax.vmap(
            lambda bx, sc, v: multiclass_nms(
                bx, sc, rcnn.get("score_thr", 0.05), nms_cfg, max_per_img,
                valid=v))(boxes_dec, scores, prop_valid)

        out = {"det_bboxes": det_boxes / jnp.asarray(scale_factor)[:, None, None],
               "det_scores": det_scores, "det_labels": det_labels,
               "det_valid": det_valid}
        # scale-space boxes feed the mask/offset branches (reference
        # test_mixins: _bboxes = det_bboxes * scale_factor)
        if self.with_mask:
            rois, roi_valid = boxes_to_rois(det_boxes, det_valid)
            mask_feats = self._mask_roi_feats(feats, rois, roi_valid,
                                              flat_pack=flat_pack)
            mask_logits = self.mask_head_m(mask_feats)
            probs = jax.nn.sigmoid(mask_logits[..., 0])
            out["mask_probs"] = probs.reshape(
                b, -1, *mask_logits.shape[1:3])
            if self.mask_iou_head_m is not None:
                # Mask Scoring: segm score = cls score * predicted IoU
                # (reference maskiou_head.get_mask_scores)
                iou_pred = self.mask_iou_head_m(mask_feats, mask_logits)
                iou_sel = jnp.take_along_axis(
                    iou_pred, jnp.clip(det_labels.reshape(-1, 1), 0,
                                       iou_pred.shape[1] - 1), axis=1)
                out["mask_scores"] = det_scores * \
                    iou_sel.reshape(det_scores.shape)
        out.update(self._extra_simple_test(feats, det_boxes, det_valid,
                                           img_shape, scale_factor,
                                           flat_pack))
        return out

    def _extra_simple_test(self, feats, det_boxes, det_valid, img_shape,
                           scale_factor, flat_pack=None):
        return {}

    # ---------------- proposal-level TTA ----------------
    def aug_test(self, img, img_shape, scale_factor, scales=(1.0,),
                 flip_directions=(None, "horizontal")):
        """Reference-style proposal-level TTA in one compiled step.

        reference flow: ``two_stage.py:201-211`` (aug_test) →
        ``test_mixins.py`` aug_test_bboxes + ``merge_augs.py:8-117``:
        (1) RPN proposals from every (scale × flip) view are mapped back
        to the base frame and NMS-merged (``merge_aug_proposals``);
        (2) the merged RoIs are re-scored in EVERY view, decoded boxes
        and class scores are averaged (``merge_aug_bboxes``) before one
        final multiclass NMS; (3) mask probabilities are computed per
        view, un-flipped, and averaged (``merge_aug_masks``); extra
        branches (offsets) are averaged with flip-polarity correction.

        Flip views mirror the whole padded canvas (same caveat as
        ``apis/test.py:make_tta_step``): exact when the canvas equals
        the valid region (BONAI's size-divisor-aligned 1024² tiles).
        """
        from ...core.nms import nms as nms_keep
        test_rpn = dict(self.test_cfg.get("rpn", {}))
        rcnn = dict(self.test_cfg["rcnn"])
        b = img.shape[0]
        pad_h, pad_w = float(img.shape[1]), float(img.shape[2])

        def _flip_boxes(boxes, ph, pw, direction):
            x1, y1, x2, y2 = (boxes[..., 0], boxes[..., 1],
                              boxes[..., 2], boxes[..., 3])
            if direction == "horizontal":
                return jnp.stack([pw - x2, y1, pw - x1, y2], -1)
            return jnp.stack([x1, ph - y2, x2, ph - y1], -1)

        # ---- build static view list: (feats, shape_v, (sy, sx),
        #      direction, (ph, pw))
        views = []
        for s in scales:
            if s == 1.0:
                img_s, shape_s = img, img_shape
                sy = sx = 1.0
                ph, pw = pad_h, pad_w
            else:
                nh = max(int(round(pad_h * s / 32)) * 32, 32)
                nw = max(int(round(pad_w * s / 32)) * 32, 32)
                sy, sx = nh / pad_h, nw / pad_w
                img_s = jax.image.resize(
                    img, (b, nh, nw, img.shape[3]), method="bilinear")
                shape_s = img_shape * jnp.asarray([sy, sx])
                ph, pw = float(nh), float(nw)
            for direction in flip_directions:
                img_v = img_s if direction is None else \
                    jnp.flip(img_s, 2 if direction == "horizontal" else 1)
                feats = self.extract_feat(img_v)
                views.append((feats, shape_s, (sy, sx), direction,
                              (ph, pw)))

        # ---- (1) merge proposals across views (merge_aug_proposals)
        all_props, all_scores, all_valid = [], [], []
        for feats, shape_v, (sy, sx), direction, (ph, pw) in views:
            (_, _, _, props, pscores,
             pvalid) = self._rpn_and_proposals(feats, shape_v, test_rpn)
            if direction is not None:
                props = _flip_boxes(props, ph, pw, direction)
            props = props / jnp.asarray([sx, sy, sx, sy])
            all_props.append(props)
            all_scores.append(pscores)
            all_valid.append(pvalid)
        cat_props = jnp.concatenate(all_props, axis=1)
        cat_scores = jnp.concatenate(all_scores, axis=1)
        cat_valid = jnp.concatenate(all_valid, axis=1)
        max_num = int(test_rpn.get("max_num", 1000))
        nms_thr = float(test_rpn.get("nms_thr", 0.7))

        def merge_one(bx, sc, v):
            keep = nms_keep(bx, sc, nms_thr, valid=v)
            s_k = jnp.where(keep, sc, -1.0)
            top, idx = jax.lax.top_k(s_k, max_num)
            return bx[idx], top > 0
        proposals, prop_valid = jax.vmap(merge_one)(
            cat_props, cat_scores, cat_valid)          # base frame

        # ---- (2) re-score merged RoIs in every view (merge_aug_bboxes)
        n = proposals.shape[1]
        coder = dict(self.bbox_coder_cfg)
        sum_boxes = 0.0
        sum_scores = 0.0
        for feats, shape_v, (sy, sx), direction, (ph, pw) in views:
            props_v = proposals * jnp.asarray([sx, sy, sx, sy])
            if direction is not None:
                props_v = _flip_boxes(props_v, ph, pw, direction)
            rois, roi_valid = boxes_to_rois(props_v, prop_valid)
            cls_score, bbox_pred = self._bbox_head_forward(feats, rois,
                                                           roi_valid)
            scores_v = jax.nn.softmax(cls_score, axis=-1).reshape(b, n, -1)
            boxes_v = jax.vmap(lambda r, d, s_: delta2bbox(
                r, d, tuple(coder.get("target_means", (0.,) * 4)),
                tuple(coder.get("target_stds", (1.,) * 4)),
                legacy=coder.get("type") == "LegacyDeltaXYWHBBoxCoder"))(
                props_v, bbox_pred.reshape(b, n, -1), shape_v)
            boxes_v = jax.vmap(clip_boxes)(boxes_v, shape_v)
            if direction is not None:
                flat = boxes_v.reshape(b, n, -1, 4)
                flat = _flip_boxes(flat, ph, pw, direction)
                boxes_v = flat.reshape(boxes_v.shape)
            boxes_v = boxes_v.reshape(b, n, -1, 4) \
                / jnp.asarray([sx, sy, sx, sy])
            sum_boxes = sum_boxes + boxes_v
            sum_scores = sum_scores + scores_v
        mean_boxes = (sum_boxes / len(views)).reshape(b, n, -1)
        mean_scores = sum_scores / len(views)

        max_per_img = rcnn.get("max_per_img", 100)
        nms_cfg = dict(rcnn.get("nms", dict(type="nms", iou_threshold=0.5)))
        det_boxes, det_scores, det_labels, det_valid = jax.vmap(
            lambda bx, sc, v: multiclass_nms(
                bx, sc, rcnn.get("score_thr", 0.05), nms_cfg, max_per_img,
                valid=v))(mean_boxes, mean_scores, prop_valid)

        out = {"det_bboxes":
               det_boxes / jnp.asarray(scale_factor)[:, None, None],
               "det_scores": det_scores, "det_labels": det_labels,
               "det_valid": det_valid}

        # ---- (3) per-view masks / extras, averaged (merge_aug_masks)
        mask_sum = 0.0
        extra_sums = {}
        for feats, shape_v, (sy, sx), direction, (ph, pw) in views:
            det_v = det_boxes * jnp.asarray([sx, sy, sx, sy])
            if direction is not None:
                det_v = _flip_boxes(det_v, ph, pw, direction)
            if self.with_mask:
                rois, roi_valid = boxes_to_rois(det_v, det_valid)
                mf = self._mask_roi_feats(feats, rois, roi_valid)
                logits = self.mask_head_m(mf)
                probs = jax.nn.sigmoid(logits[..., 0]).reshape(
                    b, -1, *logits.shape[1:3])
                if direction is not None:
                    probs = jnp.flip(
                        probs, 3 if direction == "horizontal" else 2)
                mask_sum = mask_sum + probs
            sf_v = jnp.asarray(scale_factor) * ((sx + sy) / 2.0)
            extras = self._extra_simple_test(feats, det_v, det_valid,
                                             shape_v, sf_v)
            for key, val in extras.items():
                if direction is not None and key.endswith("offsets"):
                    pol = jnp.asarray([-1.0, 1.0]) \
                        if direction == "horizontal" \
                        else jnp.asarray([1.0, -1.0])
                    val = val * pol
                elif direction is not None and "probs" in key:
                    continue        # spatial grids: keep base view only
                extra_sums.setdefault(key, []).append(val)
        if self.with_mask:
            out["mask_probs"] = mask_sum / len(views)
        for key, vals in extra_sums.items():
            out[key] = sum(vals) / len(vals)
        return out


class FasterRCNN(TwoStageDetector):
    """reference: ``mmdet/models/detectors/faster_rcnn.py``."""


class MaskRCNN(TwoStageDetector):
    """reference: ``mmdet/models/detectors/mask_rcnn.py``."""


class DynamicRCNN(TwoStageDetector):
    """Dynamic R-CNN (reference ``mmdet/models/detectors/
    dynamic_rcnn.py`` + ``roi_heads/dynamic_roi_head.py``): a Faster
    R-CNN whose second-stage IoU threshold and SmoothL1 beta follow the
    proposal-quality statistics.  The statistics are computed in the
    compiled step (``_roi_forward_train`` with
    ``train_cfg.rcnn.dynamic_rcnn``) and the schedule runs on the host
    (``apis/train.py``)."""


class RPN(TwoStageDetector):
    """RPN-only detector (reference ``mmdet/models/detectors/rpn.py``):
    proposals are the detections; no second stage.  Configure with
    ``roi_head=None``."""

    def forward_train(self, batch):
        feats = self.extract_feat(batch["image"])
        proposal_cfg = dict(self.train_cfg.get("rpn_proposal", {}))
        (cls_scores, bbox_preds, anchors_levels, _, _,
         _) = self._rpn_and_proposals(feats, batch["img_shape"],
                                      proposal_cfg)
        from ..dense_heads.rpn_head import rpn_loss
        anchors_flat = jnp.concatenate(anchors_levels, axis=0)
        return rpn_loss(cls_scores, bbox_preds, anchors_flat,
                        batch["gt_bboxes"], batch["gt_valid"],
                        self.make_rng("sampling"),
                        dict(self.train_cfg["rpn"]))


class FastRCNN(TwoStageDetector):
    """Fast R-CNN (reference ``mmdet/models/detectors/fast_rcnn.py``):
    second stage on externally supplied proposals (selective search /
    cached RPN).  ``batch['proposals']`` (B, N, 4) +
    ``batch['proposals_valid']`` (B, N) replace the RPN branch."""

    def forward_train(self, batch):
        feats = self.extract_feat(batch["image"])
        rng = self.make_rng("sampling")
        proposals = batch["proposals"]
        prop_valid = batch.get(
            "proposals_valid",
            jnp.ones(proposals.shape[:2], bool))
        losses, _ = self._image_level_train(feats, batch)
        losses = dict(losses)
        losses.update(self._roi_forward_train(
            feats, proposals, prop_valid, batch, rng))
        return losses

    def simple_test(self, img, img_shape, scale_factor, proposals,
                    proposals_valid=None):
        feats = self.extract_feat(img)
        if proposals_valid is None:
            proposals_valid = jnp.ones(proposals.shape[:2], bool)
        return self._rcnn_simple_test(feats, proposals, proposals_valid,
                                      img_shape, scale_factor)
