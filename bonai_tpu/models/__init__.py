from .builder import DETECTORS, build_detector
from .losses import LOSSES, build_loss
from .backbones import ResNet
from .necks import FPN
from .dense_heads import RPNHead
from .roi_heads import (Shared2FCBBoxHead, FCNMaskHead, OffsetHead,
                        OffsetHeadExpandFeature)
from .detectors import TwoStageDetector, FasterRCNN, MaskRCNN, LOFT

__all__ = [
    "DETECTORS", "build_detector", "LOSSES", "build_loss", "ResNet", "FPN",
    "RPNHead", "Shared2FCBBoxHead", "FCNMaskHead", "OffsetHead",
    "OffsetHeadExpandFeature", "TwoStageDetector", "FasterRCNN", "MaskRCNN",
    "LOFT",
]
