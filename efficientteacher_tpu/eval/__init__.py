from .metrics import (
    AverageMeter,
    ConfusionMatrix,
    MetricMeter,
    ap_per_class,
    compute_ap,
    fitness,
    process_batch,
)
from . import keypoint_metrics, validator
from .multi_backend import DetectBackend

__all__ = [
    "AverageMeter", "ConfusionMatrix", "MetricMeter", "ap_per_class",
    "compute_ap", "fitness", "process_batch", "validator",
    "keypoint_metrics", "DetectBackend",
]
