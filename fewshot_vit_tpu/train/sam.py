"""Sharpness-Aware Minimization (SAM) as a functional two-pass wrapper.

Re-design of the reference's (catalogued-but-unwired) ``sun_meta_training/
sam.py:4-62`` torch optimizer: perturb params by rho * g / ||g||, recompute the
loss gradient at the perturbed point, apply the base optax update with it. In
JAX this is a pure function over (loss_fn, params) — no optimizer subclassing,
no closure protocol, and the whole two-pass fuses into the jitted train step.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax


def _global_norm(tree: Any) -> jax.Array:
    return jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in jax.tree_util.tree_leaves(tree)))


def sam_gradient(
    loss_fn: Callable[[Any], Any],
    params: Any,
    rho: float = 0.05,
    adaptive: bool = False,
    has_aux: bool = False,
) -> Tuple[Any, Any]:
    """Return (sharpness-aware grads, (loss, aux)) for ``loss_fn(params)``.

    First pass: grads at w; ascend to w + e(w) with
    e = rho * (|w|^2 *)? g / ||(|w| *)? g||; second pass: grads at the
    perturbed point are the SAM update direction (reference first_step /
    second_step semantics).
    """
    grad_fn = jax.value_and_grad(loss_fn, has_aux=has_aux)
    out1, g1 = grad_fn(params)
    if adaptive:
        scaled = jax.tree_util.tree_map(lambda p, g: jnp.abs(p) * g, params, g1)
        norm = _global_norm(scaled)
        e_w = jax.tree_util.tree_map(
            lambda p, g: (rho / (norm + 1e-12)) * jnp.square(p) * g, params, g1
        )
    else:
        norm = _global_norm(g1)
        e_w = jax.tree_util.tree_map(lambda g: (rho / (norm + 1e-12)) * g, g1)
    perturbed = jax.tree_util.tree_map(lambda p, e: p + e, params, e_w)
    out2, g2 = grad_fn(perturbed)
    del out2  # loss reported at w, grads from w + e(w)
    return g2, out1


def make_sam_pretrain_step(
    model, tx: optax.GradientTransformation, rho: float = 0.05,
    adaptive: bool = False, preprocess_fn=None, mean=None, std=None,
    jit: bool = True,
) -> Callable:
    """SAM variant of ``steps.make_pretrain_step`` (two forward-backward
    passes per step)."""
    from ..data.transforms import MEAN, STD, normalize
    from ..ops.metric import compute_acc
    from .steps import _apply_train
    from .state import TrainState

    mean = MEAN if mean is None else mean
    std = STD if std is None else std

    def step(state: TrainState, images_u8, labels, rng):
        if preprocess_fn is not None:
            x = preprocess_fn(images_u8, jax.random.fold_in(rng, 7))
        else:
            x = normalize(images_u8, mean, std)

        def loss_fn(params):
            logits, new_stats = _apply_train(model, params, state.batch_stats, x, rng)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels
            ).mean()
            return loss, (logits, new_stats)

        grads, (loss, (logits, new_stats)) = sam_gradient(
            loss_fn, state.params, rho=rho, adaptive=adaptive, has_aux=True
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, batch_stats=new_stats,
            opt_state=opt_state,
        )
        return new_state, {"loss": loss, "acc": compute_acc(logits, labels)}

    return jax.jit(step, donate_argnums=(0,)) if jit else step
