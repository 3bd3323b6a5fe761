"""Epoch-level programs and the shared training runner.

TPU-native structure forced by measurement (host<->device link here runs at
~MB/s with ~100ms roundtrips): the train split lives in HBM as uint8, each
epoch is ONE jit program — ``lax.scan`` over steps, each step gathering its
batch by index, augmenting on device, and updating state — and only per-step
metric scalars come back to the host, once per epoch.

Replaces the reference's per-phase Python hot loops + DataLoader worker pools
(SURVEY.md §3.1-§3.3).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data.transforms import normalize
from ..ops.metric import compute_acc
from . import steps as steps_mod


def make_pretrain_epoch(model, tx, preprocess_fn=None, mean=None, std=None,
                        sam_rho=None, sam_adaptive=False,
                        ema_decay=None, remat=False) -> Callable:
    """jit: (state, images (N,H,W,3) u8, labels (N,), idx (S,B), rng) ->
    (state, metrics dict of (S,) arrays).

    ``sam_rho`` switches the per-step update to Sharpness-Aware Minimization
    (two fwd-bwd passes; reference ``sun_meta_training/sam.py:4-62``).
    ``ema_decay`` maintains an EMA shadow of the params in
    ``state.ema_params`` (reference ``ModelEma``; the state must be created
    with ``TrainState.create(..., ema=True)``)."""
    kw = {}
    if mean is not None:
        kw = {"mean": mean, "std": std}

    if sam_rho:
        if ema_decay:
            raise ValueError("ema_decay is not supported with the SAM step")
        if remat:
            raise ValueError("remat is not supported with the SAM step")
        from .sam import make_sam_pretrain_step

        step = make_sam_pretrain_step(
            model, tx, rho=float(sam_rho), adaptive=bool(sam_adaptive),
            preprocess_fn=preprocess_fn, jit=False, **kw,
        )
    else:
        step = steps_mod.make_pretrain_step(
            model, tx, preprocess_fn=preprocess_fn, jit=False, remat=remat,
            ema_decay=float(ema_decay) if ema_decay else None, **kw)

    def epoch(state, images, labels, idx, rng):
        def body(state, scan_in):
            idx_b, i = scan_in
            s, m = step(state, images[idx_b], labels[idx_b], jax.random.fold_in(rng, i))
            return s, m

        n_steps = None  # static from idx shape
        state, ms = jax.lax.scan(
            body, state, (idx, jnp.arange(idx.shape[0]))
        )
        return state, ms

    return jax.jit(epoch, donate_argnums=(0,))


def make_sun_epoch(student, teacher, tx, dual_view_fn=None, mean=None, std=None,
                   remat=False, **sun_kw) -> Callable:
    """jit: (state, teacher_vars, images u8, labels, idx (S,B), rng) -> (state, metrics)."""
    kw = dict(sun_kw)
    if mean is not None:
        kw.update(mean=mean, std=std)
    step = steps_mod.make_sun_step(
        student, teacher, tx, dual_view_fn=dual_view_fn, jit=False, remat=remat, **kw
    )

    def epoch(state, teacher_variables, images, labels, idx, rng):
        def body(state, scan_in):
            idx_b, i = scan_in
            imgs = images[idx_b]
            s, m = step(
                state, teacher_variables, imgs, imgs, labels[idx_b],
                jax.random.fold_in(rng, i),
            )
            return s, m

        state, ms = jax.lax.scan(body, state, (idx, jnp.arange(idx.shape[0])))
        return state, ms

    return jax.jit(epoch, donate_argnums=(0,))


def make_meta_tune_epoch(
    head, tx, way, shot, query, ep_per_batch,
    freeze_bn=False, preprocess_fn=None, mean=None, std=None,
) -> Callable:
    """jit: (state, images u8, idx (S, E*way*(shot+query)), rng) -> (state, metrics)."""
    kw = {}
    if mean is not None:
        kw = {"mean": mean, "std": std}
    step = steps_mod.make_meta_tune_step(
        head, tx, way=way, query=query, ep_per_batch=ep_per_batch,
        freeze_bn=freeze_bn, preprocess_fn=preprocess_fn, jit=False, **kw
    )

    from ..ops.episodes import split_shot_query

    def epoch(state, images, idx, rng):
        def body(state, scan_in):
            idx_b, i = scan_in
            imgs = images[idx_b]  # (E*way*(s+q), H, W, 3)
            xs, xq = split_shot_query(imgs, way, shot, query, ep_per_batch)
            s, m = step(state, xs, xq, jax.random.fold_in(rng, i))
            return s, m

        state, ms = jax.lax.scan(body, state, (idx, jnp.arange(idx.shape[0])))
        return state, ms

    return jax.jit(epoch, donate_argnums=(0,))


def make_eval_ce_epoch(model, mean, std, n_valid=None) -> Callable:
    """jit CE/acc eval over a fixed batch grid (no state mutation).

    ``n_valid`` marks how many leading flattened slots of the ``idx`` grid are
    real samples: ``batch_indices(drop_last=False)`` cycles the permutation to
    fill the last batch, and those duplicates must not be scored twice (each
    val image counts exactly once, like the reference's DataLoader with a
    smaller final batch). Returns per-step SUMS — reduce with
    ``eval_metrics``."""

    def epoch(variables, images, labels, idx):
        import optax

        s, b = idx.shape
        total = n_valid if n_valid is not None else s * b
        mask = (jnp.arange(s * b).reshape(s, b) < total).astype(jnp.float32)

        def body(carry, scan_in):
            idx_b, m_b = scan_in
            x = normalize(images[idx_b], mean, std)
            logits = model.apply(variables, x, train=False)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels[idx_b]
            )
            correct = (jnp.argmax(logits, -1) == labels[idx_b]).astype(jnp.float32)
            return carry, {"loss_sum": (ce * m_b).sum(),
                           "correct": (correct * m_b).sum(),
                           "n": m_b.sum()}

        _, ms = jax.lax.scan(body, None, (idx, mask))
        return ms

    return jax.jit(epoch)


def eval_metrics(ms: Dict[str, jax.Array]) -> Dict[str, float]:
    """Exact loss/acc means from make_eval_ce_epoch's per-step sums."""
    n = float(np.sum(np.asarray(ms["n"])))
    return {"loss": float(np.sum(np.asarray(ms["loss_sum"]))) / n,
            "acc": float(np.sum(np.asarray(ms["correct"]))) / n}


def batch_indices(n: int, batch_size: int, rng: np.random.Generator, drop_last: bool = True) -> np.ndarray:
    """Shuffled (steps, batch_size) index matrix for one epoch.

    ``drop_last=False`` cycles the permutation to fill the final batch (valid
    for any batch_size, including batch_size > n); consumers that must score
    each sample exactly once mask the tail via ``make_eval_ce_epoch(n_valid=n)``."""
    perm = rng.permutation(n)
    n_steps = n // batch_size if drop_last else -(-n // batch_size)
    if not drop_last:
        perm = np.resize(perm, n_steps * batch_size)
    return perm[: n_steps * batch_size].reshape(n_steps, batch_size).astype(np.int32)


def metrics_mean(ms: Dict[str, jax.Array]) -> Dict[str, float]:
    return {k: float(np.mean(np.asarray(v))) for k, v in ms.items()}
