from .optim import OptimizerConfig, one_cycle, sgd_update
from .supervised import Schedule, make_supervised_train_step
from .train_state import (
    EMAState,
    TrainState,
    cosine_ema_decay,
    create_train_state,
    ema_update,
    init_ema,
)

__all__ = [
    "OptimizerConfig", "one_cycle", "sgd_update", "Schedule",
    "make_supervised_train_step", "EMAState", "TrainState",
    "cosine_ema_decay", "create_train_state", "ema_update", "init_ema",
]
