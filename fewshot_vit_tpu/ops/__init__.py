from .metric import (
    compute_logits,
    compute_acc,
    mean_confidence_interval,
    l2_normalize,
)
from .episodes import split_shot_query, make_nk_label
from .token_label import generate_soft_label, soft_target_cross_entropy
from .emd import emd_distance, normalize_weights, sinkhorn

__all__ = [
    "compute_logits",
    "compute_acc",
    "mean_confidence_interval",
    "l2_normalize",
    "split_shot_query",
    "make_nk_label",
    "generate_soft_label",
    "soft_target_cross_entropy",
    "emd_distance",
    "normalize_weights",
    "sinkhorn",
]
