"""Detector builder (reference: ``mmdet/models/builder.py:4-67``).

``build_detector(cfg, train_cfg, test_cfg)`` resolves ``cfg['type']``
against the DETECTORS registry and instantiates the flax module with the
raw config dicts (submodules are constructed inside ``setup``).
"""

from __future__ import annotations

import copy
import os

from ..registry import Registry

DETECTORS = Registry("detector")


def _plain(obj):
    """ConfigDict -> plain dict, recursively."""
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    return obj


def build_detector(cfg, train_cfg=None, test_cfg=None, compute_dtype=None,
                   roi_align_impl=None):
    from .detectors import FasterRCNN, MaskRCNN, LOFT, TwoStageDetector
    from .detectors.two_stage import DynamicRCNN, FastRCNN, RPN
    from .detectors.single_stage import (ATSS, CornerNet, FCOS, FSAF,
                                         FoveaBox, FreeAnchor, GFL,
                                         NASFCOS, RepPointsDetector,
                                         RetinaNet, SSD)
    from .detectors.cascade_rcnn import CascadeRCNN
    from .detectors.grid_rcnn import GridRCNN
    from .detectors.htc import HTC
    from .detectors.point_rend import PointRend
    registry = {"FasterRCNN": FasterRCNN, "MaskRCNN": MaskRCNN,
                # Mask Scoring R-CNN is MaskRCNN + a mask_iou_head in the
                # roi_head cfg (reference mask_scoring_rcnn.py is an
                # empty TwoStageDetector subclass)
                "MaskScoringRCNN": MaskRCNN,
                "LOFT": LOFT, "TwoStageDetector": TwoStageDetector,
                "RetinaNet": RetinaNet, "FCOS": FCOS, "ATSS": ATSS,
                "FSAF": FSAF, "GFL": GFL, "FOVEA": FoveaBox,
                "FoveaBox": FoveaBox, "FreeAnchor": FreeAnchor,
                "RepPointsDetector": RepPointsDetector, "SSD": SSD,
                "DynamicRCNN": DynamicRCNN,
                "CascadeRCNN": CascadeRCNN, "HTC": HTC,
                "HybridTaskCascade": HTC,
                "GridRCNN": GridRCNN, "PointRend": PointRend,
                "CornerNet": CornerNet, "RPN": RPN, "FastRCNN": FastRCNN,
                "NASFCOS": NASFCOS}
    registry.update(DETECTORS.module_dict)
    cfg = _plain(dict(cfg))
    det_type = cfg.pop("type")
    if det_type not in registry:
        raise KeyError(f"unknown detector type {det_type}; "
                       f"available: {sorted(registry)}")
    kwargs = dict(
        backbone=cfg.get("backbone"),
        neck=cfg.get("neck"),
        train_cfg=_plain(dict(train_cfg)) if train_cfg else None,
        test_cfg=_plain(dict(test_cfg)) if test_cfg else None,
        pretrained=cfg.get("pretrained"),
    )
    if "rpn_head" in cfg or "roi_head" in cfg:
        kwargs["rpn_head"] = cfg.get("rpn_head")
        kwargs["roi_head"] = cfg.get("roi_head")
    else:   # single-stage
        kwargs["bbox_head"] = cfg.get("bbox_head")
    if compute_dtype is not None:
        kwargs["compute_dtype"] = compute_dtype
    # BONAI_ROI_IMPL overrides the configured RoIAlign kernel for A/B
    # benchmarking without touching config files (gather/pallas/block).
    impl = (os.environ.get("BONAI_ROI_IMPL") or roi_align_impl
            or cfg.get("roi_align_impl"))
    if impl is not None and det_type not in ("RetinaNet", "FCOS", "ATSS", "FSAF", "GFL",
                                     "FoveaBox", "FreeAnchor",
                                     "RepPointsDetector", "SSD"):
        kwargs["roi_align_impl"] = impl
    return registry[det_type](**kwargs)
