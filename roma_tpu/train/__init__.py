from .checkpoint import CheckPoint
from .gt_warp import get_gt_warp, warp_kpts
from .losses import RobustLosses
from .losses_tiny import TinyRobustLosses
from .optim import ema_params, make_optimizer, multistep_lr
from .train import (
    TrainState,
    grad_statistics,
    init_train_state,
    make_train_step,
    nonfinite_grad_names,
    train_epoch,
    train_k_epochs,
    train_k_steps,
)

__all__ = [
    "CheckPoint",
    "get_gt_warp",
    "warp_kpts",
    "RobustLosses",
    "TinyRobustLosses",
    "ema_params",
    "make_optimizer",
    "multistep_lr",
    "TrainState",
    "grad_statistics",
    "nonfinite_grad_names",
    "init_train_state",
    "make_train_step",
    "train_epoch",
    "train_k_epochs",
    "train_k_steps",
]
