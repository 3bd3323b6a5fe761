"""Optimizer + LR-schedule factory (optax).

Covers the reference's optimization recipes:
  * teacher pretraining: AdamW with lr scaled by batch/512, cosine schedule
    with linear warmup (``sun_train_teacher/train_classifier.py:130-132``,
    config ``train_classifier_mini_visformer_300epoch.yaml``);
  * meta-tuning: SGD(momentum 0.9) + MultiStepLR(gamma 0.1), optionally with a
    warmup (``utils.make_optimizer``, ``train_meta_warmup.py:140-141``);
  * weight decay masked to rank>=2 params (timm convention: biases, norm
    scales, 1-D params undecayed).

Schedules are per-step; epoch-based configs convert via ``steps_per_epoch``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
import optax


def decay_mask(params: Any) -> Any:
    """True where weight decay applies (rank >= 2)."""
    return jax.tree_util.tree_map(lambda p: np.ndim(p) >= 2, params)


def cosine_warmup_schedule(
    base_lr: float,
    steps_per_epoch: int,
    epochs: int,
    warmup_epochs: int = 0,
    warmup_lr: float = 1e-6,
    min_lr: float = 1e-5,
) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        init_value=warmup_lr,
        peak_value=base_lr,
        warmup_steps=warmup_epochs * steps_per_epoch,
        decay_steps=epochs * steps_per_epoch,
        end_value=min_lr,
    )


def multistep_schedule(
    base_lr: float,
    steps_per_epoch: int,
    milestones: Sequence[int],
    gamma: float = 0.1,
    warmup_epochs: int = 0,
    warmup_lr: float = 1e-6,
) -> optax.Schedule:
    warmup_steps = max(0, warmup_epochs) * steps_per_epoch
    # join_schedules passes (step - boundary) to later schedules, so express
    # milestone boundaries relative to warmup end to keep them in global epochs
    boundaries = {
        int(m) * steps_per_epoch - warmup_steps: gamma
        for m in milestones
        if int(m) * steps_per_epoch > warmup_steps
    }
    sched = optax.piecewise_constant_schedule(base_lr, boundaries)
    if warmup_steps <= 0:
        return sched
    warm = optax.linear_schedule(warmup_lr, base_lr, warmup_steps)
    return optax.join_schedules([warm, sched], [warmup_steps])


def make_optimizer(
    params: Any,
    name: str = "sgd",
    lr: float = 1e-3,
    weight_decay: float = 0.0,
    schedule: Optional[optax.Schedule] = None,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    """sgd | adam | adamw, with optional schedule and global-norm clipping."""
    lr_or_sched: Any = schedule if schedule is not None else lr
    if name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay, mask=decay_mask(params))
            if weight_decay
            else optax.identity(),
            optax.sgd(lr_or_sched, momentum=0.9),
        )
    elif name == "adam":
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay, mask=decay_mask(params))
            if weight_decay
            else optax.identity(),
            optax.adam(lr_or_sched),
        )
    elif name == "adamw":
        tx = optax.adamw(
            lr_or_sched, weight_decay=weight_decay, mask=decay_mask(params)
        )
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def zero_nan_grads() -> optax.GradientTransformation:
    """TPU-native ``detect_grad_nan`` (reference ``Models/utils.py:115-118``):
    zero any gradient leaf elementwise where it is NaN, inside the step."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        import jax.numpy as jnp

        updates = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isnan(g), 0.0, g), updates
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)
