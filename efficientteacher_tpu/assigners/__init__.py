from .simota import SimOTAResult, simota_assign
from .tal import TALResult, tal_assign
from .yolo_anchor import DenseAssignment, assign_all_scales, assign_scale

__all__ = [
    "SimOTAResult", "simota_assign", "TALResult", "tal_assign",
    "DenseAssignment", "assign_all_scales", "assign_scale",
]
