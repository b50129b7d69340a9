"""Loss zoo (reference models/loss/__init__.py:6-20 build_loss/build_ssod_loss)."""

from .domain_loss import domain_loss, target_loss
from .ssod_loss import SSODLossConfig, compute_ssod_loss
from .tal_loss import TALLossConfig, compute_tal_loss
from .yolov5_loss import YoloV5LossConfig, compute_loss
from .yolov5_ota_loss import compute_ota_loss
from .yolox_loss import YoloXLossConfig, compute_yolox_loss

# Loss.type registry mirroring the reference's build_loss dispatch
LOSS_FAMILIES = {
    "ComputeLoss": compute_loss,
    "ComputeXLoss": compute_yolox_loss,
    "ComputeFastXLoss": compute_yolox_loss,
    "ComputeTalLoss": compute_tal_loss,
}

__all__ = [
    "domain_loss", "target_loss", "SSODLossConfig", "compute_ssod_loss",
    "TALLossConfig", "compute_tal_loss", "YoloV5LossConfig", "compute_loss",
    "compute_ota_loss", "YoloXLossConfig", "compute_yolox_loss",
    "LOSS_FAMILIES",
]
