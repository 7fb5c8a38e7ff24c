from fastscnn_tpu.utils.lr_scheduler import lr_schedule, LRScheduler
from fastscnn_tpu.utils.metric import (
    SegmentationMetric,
    seg_hist_update,
    seg_scores_from_hist,
)
from fastscnn_tpu.utils.visualize import get_color_pallete, cityspallete

__all__ = [
    "lr_schedule",
    "LRScheduler",
    "SegmentationMetric",
    "seg_hist_update",
    "seg_scores_from_hist",
    "get_color_pallete",
    "cityspallete",
]
