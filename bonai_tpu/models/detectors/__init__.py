from .two_stage import TwoStageDetector, FasterRCNN, MaskRCNN
from .loft import LOFT

__all__ = ["TwoStageDetector", "FasterRCNN", "MaskRCNN", "LOFT"]
