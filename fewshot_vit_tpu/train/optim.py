"""Optimizer + LR-schedule factory (optax).

Covers the reference's optimization recipes EXACTLY (the schedules reproduce
the per-epoch lr sequences its torch/timm schedulers emit, pinned by
``tests/test_trajectory_parity.py``):
  * teacher pretraining: AdamW with lr scaled by batch/512 + timm
    ``CosineLRScheduler`` (``sun_train_teacher/train_classifier.py:130-132``);
  * SUN-M meta-tuning: SGD(momentum 0.9) + torch ``MultiStepLR``
    (``meta_tuning_sun_m/utils/__init__.py:128-139``) or + timm
    ``MultiStepLRScheduler`` with warmup (``train_meta_warmup.py:140-141``);
  * weight decay on EVERY param (the reference passes ``model.parameters()``
    straight to torch SGD/AdamW — biases, norm scales, and the meta-baseline
    temp are all decayed). The timm no-decay convention is opt-in via
    ``mask_decay=True``.

All reference schedulers hold lr constant within an epoch and are stepped at
epoch END: torch's ``MultiStepLR.step()`` and — one epoch *lagged* — timm's
``step(epoch-1)`` (``train_classifier.py:206``, ``train_meta_warmup.py:217``),
so the lr used during 1-based epoch E is the value for t = E-2 (epoch 1 runs
at the construction-time lr: ``warmup_lr_init`` when warmup is on, else the
base lr). The factories below precompute that per-epoch sequence and quantize
it to steps.
"""

from __future__ import annotations

import bisect
import math
from typing import Any, Optional, Sequence

import jax
import numpy as np
import optax


def decay_mask(params: Any) -> Any:
    """True where weight decay applies (rank >= 2) — the timm convention.
    NOT the reference behavior (see module docstring); opt-in only."""
    return jax.tree_util.tree_map(lambda p: np.ndim(p) >= 2, params)


def _epoch_quantized(epoch_lrs: Sequence[float], steps_per_epoch: int) -> optax.Schedule:
    """Schedule that holds ``epoch_lrs[e]`` through 0-based epoch ``e`` (the
    last value persists past the table, covering the pretrain ``epoch_ex``
    extra epoch)."""
    import jax.numpy as jnp

    lrs = jnp.asarray(np.asarray(epoch_lrs, np.float32))

    def schedule(step):
        e = jnp.minimum(step // steps_per_epoch, lrs.shape[0] - 1)
        return lrs[e]

    return schedule


def _timm_epoch_sequence(get_lr, epochs: int, warmup_epochs: int,
                         warmup_lr: float, base_lr: float, extra: int = 2):
    """Per-epoch lr actually *used* under the reference's stepping discipline:
    timm schedulers set lr at construction (``warmup_lr_init`` iff warmup_t>0)
    and are stepped ``step(epoch-1)`` at the END of 1-based epoch ``epoch`` —
    so epoch E>=2 runs at ``_get_lr(E-2)``."""
    first = warmup_lr if warmup_epochs > 0 else base_lr
    return [first] + [get_lr(e - 1) for e in range(1, epochs + extra)]


def timm_cosine_schedule(
    base_lr: float,
    steps_per_epoch: int,
    epochs: int,
    warmup_epochs: int = 0,
    warmup_lr: float = 1e-6,
    lr_min: float = 0.0,
) -> optax.Schedule:
    """timm ``CosineLRScheduler(t_initial=epochs, warmup_t, warmup_lr_init,
    cycle_decay, cycle_limit=1, warmup_prefix=False, t_in_epochs=True)`` under
    the reference's end-of-epoch ``step(epoch-1)`` (``train_classifier.py:132,206``).

    Semantics pinned by tests/test_trajectory_parity.py: warmup counts INSIDE
    t_initial (the cosine never reaches base_lr — at t=warmup_t it is already
    partially decayed), lr_min defaults to 0 (the reference passes none), and
    past the single cycle (t >= epochs) the lr floors at lr_min."""

    def get_lr(t: int) -> float:
        if t < warmup_epochs:
            return warmup_lr + t * (base_lr - warmup_lr) / warmup_epochs
        if t // epochs >= 1:  # cycle_limit=1
            return lr_min
        return lr_min + 0.5 * (base_lr - lr_min) * (
            1.0 + math.cos(math.pi * (t % epochs) / epochs)
        )

    seq = _timm_epoch_sequence(get_lr, epochs, warmup_epochs, warmup_lr, base_lr)
    return _epoch_quantized(seq, steps_per_epoch)


def timm_multistep_schedule(
    base_lr: float,
    steps_per_epoch: int,
    epochs: int,
    milestones: Sequence[int],
    gamma: float = 0.5,
    warmup_epochs: int = 3,
    warmup_lr: float = 1e-5,
) -> optax.Schedule:
    """timm ``MultiStepLRScheduler(decay_t=milestones, decay_rate=gamma,
    warmup_t, warmup_lr_init)`` under end-of-epoch ``step(epoch-1)``
    (``train_meta_warmup.py:141,217``; warmup_t=3, warmup_lr_init=1e-5 there).

    timm decays at ``bisect_right(milestones, t+1)`` — the ``t+1`` exactly
    cancels the ``step(epoch-1)`` lag, so the decayed lr is first used in
    epoch ``milestone+1``, same as plain torch MultiStepLR."""
    ms = sorted(int(m) for m in milestones)

    def get_lr(t: int) -> float:
        if t < warmup_epochs:
            return warmup_lr + t * (base_lr - warmup_lr) / warmup_epochs
        return base_lr * gamma ** bisect.bisect_right(ms, t + 1)

    seq = _timm_epoch_sequence(get_lr, epochs, warmup_epochs, warmup_lr, base_lr)
    return _epoch_quantized(seq, steps_per_epoch)


def multistep_schedule(
    base_lr: float,
    steps_per_epoch: int,
    milestones: Sequence[int],
    gamma: float = 0.1,
) -> optax.Schedule:
    """torch ``MultiStepLR`` stepped once at each epoch end
    (``meta_tuning_sun_m/train_meta.py:211``, ``meta_tuning_sun_d/
    train_meta.py`` StepLR as milestones every step_size): 1-based epoch E
    runs at ``base_lr * gamma ** bisect_right(milestones, E-1)`` — piecewise
    constant on epoch boundaries, so the per-step form is exact."""
    boundaries = {int(m) * steps_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(
    params: Any,
    name: str = "sgd",
    lr: float = 1e-3,
    weight_decay: float = 0.0,
    schedule: Optional[optax.Schedule] = None,
    grad_clip: Optional[float] = None,
    mask_decay: bool = False,
) -> optax.GradientTransformation:
    """sgd | adam | adamw, with optional schedule and global-norm clipping.

    Weight decay hits EVERY param by default — the reference passes
    ``model.parameters()`` straight to torch SGD/AdamW with no param groups
    (``train_classifier.py:131``, ``train_meta_warmup.py:140``, ``utils.
    make_optimizer``), so biases/norm scales/temp are decayed too; trajectory
    parity (tests/test_trajectory_parity.py) pins this. ``mask_decay=True``
    opts into the timm rank>=2 convention instead."""
    mask = decay_mask(params) if mask_decay else None
    lr_or_sched: Any = schedule if schedule is not None else lr
    if name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay, mask=mask)
            if weight_decay
            else optax.identity(),
            optax.sgd(lr_or_sched, momentum=0.9),
        )
    elif name == "adam":
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay, mask=mask)
            if weight_decay
            else optax.identity(),
            optax.adam(lr_or_sched),
        )
    elif name == "adamw":
        tx = optax.adamw(lr_or_sched, weight_decay=weight_decay, mask=mask)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def zero_nan_tensor(g):
    """Zero the WHOLE tensor when it contains any NaN — the reference's
    per-parameter rule (``detect_grad_nan``, ``Models/utils.py:115-118``
    calls ``param.grad.zero_()`` on any NaN), not elementwise masking."""
    import jax.numpy as jnp

    return jnp.where(jnp.any(jnp.isnan(g)), jnp.zeros_like(g), g)


def zero_nan_grads() -> optax.GradientTransformation:
    """TPU-native ``detect_grad_nan`` (reference ``Models/utils.py:115-118``):
    per gradient leaf, zero the ENTIRE tensor if it contains any NaN, inside
    the step. The reference applies this after every accumulation episode;
    the SUN-D accumulation path mirrors that per-episode too
    (``train/meta_tune_emd.py::make_emd_epoch_fn``) — this transform is the
    step-level line of defense shared by all paths."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(zero_nan_tensor, updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)
