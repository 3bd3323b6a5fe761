"""The three phase train steps, each ONE jit-compiled program.

Replaces the reference's per-phase Python hot loops (SURVEY.md §3):
  * ``make_pretrain_step``  — phase 1 teacher CE
    (``sun_train_teacher/train_classifier.py:161-174``);
  * ``make_sun_step``       — phase 2 SUN meta-training: student CE + weighted
    soft token-label loss from a frozen teacher (``sun_meta_training/offline.py:263-309``);
  * ``make_meta_tune_step`` — phase 3a Meta-Baseline episodic CE
    (``meta_tuning_sun_m/train_meta.py:162-185``).

Each step takes uint8 device batches (normalization fuses into the program),
threads an explicit per-step rng, updates batch stats, and returns metrics as
device scalars. Under a sharded batch axis the same programs are data-parallel
(see ``parallel.mesh``) — no DataParallel wrapper, no gradient-reduce code.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.transforms import MEAN, STD, normalize
from ..ops.episodes import make_nk_label
from ..ops.metric import compute_acc
from ..ops.token_label import generate_soft_label, soft_target_cross_entropy
from .state import TrainState, ema_update


def _apply_train(model, params, batch_stats, x, rng, **kwargs):
    variables = {"params": params, "batch_stats": batch_stats}
    out, mut = model.apply(
        variables, x, train=True,
        mutable=["batch_stats"],
        rngs={"droppath": rng, "dropout": jax.random.fold_in(rng, 1)},
        **kwargs,
    )
    return out, mut.get("batch_stats", batch_stats)


def _train_apply_fn(model, remat: bool):
    """The (params, batch_stats, x, rng) -> (out, new_stats) forward used
    inside loss functions. ``remat=True`` wraps it in ``jax.checkpoint``:
    the backward pass recomputes the forward instead of storing its
    activations — the standard TPU HBM-for-FLOPs trade for batch sizes or
    models that otherwise exceed device memory (identical values/grads)."""
    fn = lambda params, batch_stats, x, rng: _apply_train(  # noqa: E731
        model, params, batch_stats, x, rng)
    return jax.checkpoint(fn) if remat else fn


def make_pretrain_step(
    model, tx: optax.GradientTransformation,
    mean=MEAN, std=STD, ema_decay: Optional[float] = None,
    preprocess_fn: Optional[Callable] = None,
    remat: bool = False,
    jit: bool = True,
) -> Callable:
    """(state, images_u8 (B,H,W,3), labels (B,), rng) -> (state, metrics).

    ``preprocess_fn(images_u8, rng) -> float images`` hooks the device-side
    augmentation pipeline; default is plain normalization. ``remat`` trades
    a forward recompute for activation memory (see `_train_apply_fn`).
    """
    apply_fn = _train_apply_fn(model, remat)

    def step(state: TrainState, images_u8, labels, rng):
        if preprocess_fn is not None:
            x = preprocess_fn(images_u8, jax.random.fold_in(rng, 7))
        else:
            x = normalize(images_u8, mean, std)

        def loss_fn(params):
            logits, new_stats = apply_fn(params, state.batch_stats, x, rng)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels
            ).mean()
            return loss, (logits, new_stats)

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = (
            ema_update(state.ema_params, params, ema_decay)
            if state.ema_params is not None and ema_decay
            else state.ema_params
        )
        new_state = state.replace(
            step=state.step + 1, params=params, batch_stats=new_stats,
            opt_state=opt_state, ema_params=ema,
        )
        return new_state, {"loss": loss, "acc": compute_acc(logits, labels)}

    return jax.jit(step, donate_argnums=(0,)) if jit else step


def make_sun_step(
    student, teacher, tx: optax.GradientTransformation,
    soft_k: int = 5, bg_tokens: int = 10, token_weight: float = 0.5,
    smoothing: float = 0.1, mean=MEAN, std=STD,
    dual_view_fn: Optional[Callable] = None,
    remat: bool = False,
    jit: bool = True,
) -> Callable:
    """SUN meta-training step.

    (state, teacher_variables, strong_u8, weak_u8, labels, rng) -> (state, metrics).
    Teacher runs frozen under the same program (no grad); its per-patch logits
    become smoothed top-k token labels with background assignment.

    ``dual_view_fn(images_u8, rng) -> (strong_float, weak_float)`` enables the
    device-side location-aware dual augmentation (strong view derived from the
    weak crop, ``datasets/mini_imagenet.py:194-204``); when set, pass the SAME
    base batch as both ``strong_u8`` and ``weak_u8``. ``remat`` recomputes the
    student forward during backward (the frozen teacher stores no activations).
    """
    student_apply = _train_apply_fn(student, remat)

    def step(state: TrainState, teacher_variables, strong_u8, weak_u8, labels, rng):
        if dual_view_fn is not None:
            xs_strong, xw = dual_view_fn(strong_u8, jax.random.fold_in(rng, 7))
        else:
            xs_strong, xw = normalize(strong_u8, mean, std), normalize(weak_u8, mean, std)
        y_token_t, _, _ = teacher.apply(teacher_variables, xw, train=False, is_teacher=True)
        b, h, w, c = y_token_t.shape
        soft = generate_soft_label(
            y_token_t.reshape(b, h * w, c).astype(jnp.float32),
            smoothing=smoothing, k=soft_k, bg_tokens=bg_tokens,
        )
        soft = jax.lax.stop_gradient(soft)

        def loss_fn(params):
            (y_token, y, _), new_stats = student_apply(
                params, state.batch_stats, xs_strong, rng
            )
            cls_loss = optax.softmax_cross_entropy_with_integer_labels(
                y.astype(jnp.float32), labels
            ).mean()
            token_loss = soft_target_cross_entropy(
                y_token.reshape(b, h * w, c + 1).astype(jnp.float32), soft
            )
            loss = cls_loss + token_weight * token_loss
            return loss, (y, new_stats, cls_loss, token_loss)

        (loss, (y, new_stats, cls_loss, token_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, batch_stats=new_stats,
            opt_state=opt_state,
        )
        metrics = {
            "loss": loss, "cls_loss": cls_loss, "token_loss": token_loss,
            "acc": compute_acc(y, labels),
        }
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,)) if jit else step


def make_meta_tune_step(
    head, tx: optax.GradientTransformation,
    way: int, query: int, ep_per_batch: int,
    mean=MEAN, std=STD, freeze_bn: bool = False,
    preprocess_fn: Optional[Callable] = None,
    jit: bool = True,
) -> Callable:
    """Episodic CE step for Meta-Baseline tuning.

    (state, x_shot_u8 (E,way,shot,H,W,3), x_query_u8 (E,way*query,H,W,3), rng)
    -> (state, metrics). ``freeze_bn`` reproduces ``utils.freeze_bn``
    (``train_meta.py:143-144``): BN uses running stats and they stay fixed.
    """
    labels = make_nk_label(way, query, ep_per_batch)

    def step(state: TrainState, x_shot_u8, x_query_u8, rng):
        if preprocess_fn is not None:
            k = jax.random.fold_in(rng, 7)
            img = x_shot_u8.shape[3:]
            xs = preprocess_fn(x_shot_u8.reshape((-1,) + img), k)
            xs = xs.reshape(x_shot_u8.shape[:3] + xs.shape[1:])
            xq = preprocess_fn(
                x_query_u8.reshape((-1,) + img), jax.random.fold_in(k, 1)
            )
            xq = xq.reshape(x_query_u8.shape[:2] + xq.shape[1:])
        else:
            xs = normalize(x_shot_u8, mean, std)
            xq = normalize(x_query_u8, mean, std)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            rngs = {"droppath": rng, "dropout": jax.random.fold_in(rng, 1)}
            if freeze_bn:
                # the reference's utils.freeze_bn: ONLY BatchNorm goes to
                # eval (running stats used, never updated) — the model stays
                # in train mode, so dropout/droppath remain stochastic
                # (meta_tuning_sun_m/train_meta.py:155-157)
                from ..models.common import frozen_bn

                with frozen_bn():
                    logits = head.apply(variables, xs, xq, train=True, rngs=rngs)
                new_stats = state.batch_stats
            else:
                logits, mut = head.apply(
                    variables, xs, xq, train=True,
                    mutable=["batch_stats"], rngs=rngs,
                )
                new_stats = mut.get("batch_stats", state.batch_stats)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits.reshape(-1, way).astype(jnp.float32), labels.reshape(-1)
            ).mean()
            return loss, (logits, new_stats)

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, batch_stats=new_stats,
            opt_state=opt_state,
        )
        acc = compute_acc(logits.reshape(-1, way), labels.reshape(-1))
        return new_state, {"loss": loss, "acc": acc}

    return jax.jit(step, donate_argnums=(0,)) if jit else step
