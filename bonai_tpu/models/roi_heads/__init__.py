from .bbox_head import Shared2FCBBoxHead, bbox_targets_single
from .mask_head import FCNMaskHead
from .offset_heads import OffsetHead, OffsetHeadExpandFeature, rotate_feature

__all__ = ["Shared2FCBBoxHead", "bbox_targets_single", "FCNMaskHead",
           "OffsetHead", "OffsetHeadExpandFeature", "rotate_feature"]
