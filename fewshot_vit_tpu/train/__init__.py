from .optim import (
    make_optimizer,
    timm_cosine_schedule,
    timm_multistep_schedule,
    multistep_schedule,
    zero_nan_grads,
    decay_mask,
)
from .state import TrainState, ema_update
from .steps import make_pretrain_step, make_sun_step, make_meta_tune_step

__all__ = [
    "make_optimizer",
    "timm_cosine_schedule",
    "timm_multistep_schedule",
    "multistep_schedule",
    "zero_nan_grads",
    "decay_mask",
    "TrainState",
    "ema_update",
    "make_pretrain_step",
    "make_sun_step",
    "make_meta_tune_step",
]
