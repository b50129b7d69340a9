from .metrics import (
    AverageMeter,
    ConfusionMatrix,
    MetricMeter,
    ap_per_class,
    compute_ap,
    fitness,
    process_batch,
)
from . import validator

__all__ = [
    "AverageMeter", "ConfusionMatrix", "MetricMeter", "ap_per_class",
    "compute_ap", "fitness", "process_batch", "validator",
]
