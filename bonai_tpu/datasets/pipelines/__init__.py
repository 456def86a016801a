from .transforms import (PIPELINES, Compose, LoadImageFromFile,
                         LoadAnnotations, Resize, RandomFlip, RandomRotate,
                         Normalize, Pad, DefaultFormatBundle, Collect,
                         MultiScaleFlipAug, build_pipeline)

__all__ = ["PIPELINES", "Compose", "LoadImageFromFile", "LoadAnnotations",
           "Resize", "RandomFlip", "RandomRotate", "Normalize", "Pad",
           "DefaultFormatBundle", "Collect", "MultiScaleFlipAug",
           "build_pipeline"]
