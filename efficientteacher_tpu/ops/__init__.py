from .boxes import (
    bbox_ioa,
    bbox_iou,
    box_iou,
    clip_coords,
    iou_loss,
    scale_coords,
    scale_coords_landmarks,
    wh_iou,
    xywh2xyxy,
    xywhn2xyxy,
    xyxy2xywh,
    xyxy2xywhn,
)
from .nms import (batched_nms, non_max_suppression,
                  non_max_suppression_lmk_and_bbox, non_max_suppression_ssod)
from .nms_pallas import greedy_nms_keep_pallas

__all__ = [
    "bbox_ioa", "bbox_iou", "box_iou", "clip_coords", "iou_loss",
    "scale_coords", "scale_coords_landmarks", "wh_iou", "xywh2xyxy", "xywhn2xyxy", "xyxy2xywh",
    "xyxy2xywhn", "batched_nms", "non_max_suppression",
    "non_max_suppression_ssod", "non_max_suppression_lmk_and_bbox",
    "greedy_nms_keep_pallas",
]
