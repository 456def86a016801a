from .boxes import (bbox_overlaps, bbox2delta, delta2bbox, offset2delta,
                    delta2offset, bbox_flip, clip_boxes, bbox_area,
                    DeltaXYWHBBoxCoder, DeltaXYOffsetCoder,
                    DeltaPolarOffsetCoder, BBOX_CODERS, build_bbox_coder)
from .anchors import AnchorGenerator, ANCHOR_GENERATORS, build_anchor_generator
from .assigners import max_iou_assign
from .samplers import random_sample, concat_gt_to_proposals
from .nms import nms, soft_nms, batched_nms, multiclass_nms

__all__ = [
    "bbox_overlaps", "bbox2delta", "delta2bbox", "offset2delta",
    "delta2offset", "bbox_flip", "clip_boxes", "bbox_area",
    "DeltaXYWHBBoxCoder", "DeltaXYOffsetCoder", "DeltaPolarOffsetCoder",
    "BBOX_CODERS", "build_bbox_coder",
    "AnchorGenerator", "ANCHOR_GENERATORS", "build_anchor_generator",
    "max_iou_assign", "random_sample", "concat_gt_to_proposals",
    "nms", "soft_nms", "batched_nms", "multiclass_nms",
]
