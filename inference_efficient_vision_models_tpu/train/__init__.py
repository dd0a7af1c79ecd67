from .losses import cross_entropy, kd_loss, masked_accuracy, sp_kd_loss
from .optim import adamw_init, adamw_update, make_lr_schedule
from .steps import make_train_step, make_kd_train_step, make_eval_step
from .loop import train_classifier, evaluate

__all__ = [
    "cross_entropy",
    "kd_loss",
    "masked_accuracy",
    "sp_kd_loss",
    "adamw_init",
    "make_lr_schedule",
    "adamw_update",
    "make_train_step",
    "make_kd_train_step",
    "make_eval_step",
    "train_classifier",
    "evaluate",
]
