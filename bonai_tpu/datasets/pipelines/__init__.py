from .transforms import (PIPELINES, Compose, LoadImageFromFile,
                         LoadAnnotations, Resize, RandomFlip, RandomRotate,
                         Normalize, Pad, DefaultFormatBundle, Collect,
                         MultiScaleFlipAug, build_pipeline)
from .corrupt import Corrupt, corrupt_image
from .auto_augment import AutoAugment, Albu, InstaBoost

__all__ = ["PIPELINES", "Compose", "LoadImageFromFile", "LoadAnnotations",
           "Resize", "RandomFlip", "RandomRotate", "Normalize", "Pad",
           "DefaultFormatBundle", "Collect", "MultiScaleFlipAug",
           "build_pipeline", "Corrupt", "corrupt_image",
           "AutoAugment", "Albu", "InstaBoost"]
