from .roi_align import (roi_align, multilevel_roi_align, map_roi_levels,
                        prepare_flat_levels)

__all__ = ["roi_align", "multilevel_roi_align", "map_roi_levels",
           "prepare_flat_levels"]
