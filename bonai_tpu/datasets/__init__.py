from .builder import DATASETS, build_dataset, build_dataloader
from .coco import CocoDataset
from .bonai import BONAI
from .coco_api import COCOIndex
from . import mask_utils
from .pipelines import PIPELINES, build_pipeline

__all__ = ["DATASETS", "build_dataset", "build_dataloader", "CocoDataset",
           "BONAI", "COCOIndex", "mask_utils", "PIPELINES",
           "build_pipeline"]
