from .coco_eval import evaluate_coco, coco_ap
from .bonai_eval import (results_to_csv_records, polygon_f1,
                         offset_error_vector, masks_to_polygons)

__all__ = ["evaluate_coco", "coco_ap", "results_to_csv_records",
           "polygon_f1", "offset_error_vector", "masks_to_polygons"]
