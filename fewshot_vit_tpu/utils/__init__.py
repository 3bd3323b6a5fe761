"""Utility namespace mirroring the reference's ``utils`` API surface.

The reference scatters these across five vendored ``utils/`` copies; here they
live in their functional homes (``core``, ``ops``, ``train``) and this module
re-exports them under the familiar names so users migrating from
DongSky/few-shot-vit find everything in one place.
"""

from ..core.log import Averager, RunLogger, Timer, compute_n_params, time_str
from ..core.rng import DEFAULT_SEED, epoch_key, np_rng, root_key
from ..ops.episodes import make_nk_label, split_shot_query
from ..ops.metric import (
    compute_acc,
    compute_acc_kshots,
    compute_logits,
    compute_logits_kshot,
    compute_logits_local_kshot,
    l2_normalize,
    mean_confidence_interval,
    roc_auc,
    softmax_kl_loss,
)
from ..train.optim import make_optimizer, zero_nan_grads
from ..train.state import ema_update

__all__ = [
    "Averager", "RunLogger", "Timer", "compute_n_params", "time_str",
    "DEFAULT_SEED", "epoch_key", "np_rng", "root_key",
    "make_nk_label", "split_shot_query",
    "compute_acc", "compute_acc_kshots", "compute_logits",
    "compute_logits_kshot", "compute_logits_local_kshot", "l2_normalize",
    "mean_confidence_interval", "roc_auc", "softmax_kl_loss",
    "make_optimizer", "zero_nan_grads", "ema_update",
]
