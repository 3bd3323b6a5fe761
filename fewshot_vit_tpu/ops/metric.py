"""Metric math: prototype logits, accuracy, confidence intervals.

Pure-jnp re-design of the reference's metric utilities
(``sun_meta_training/utils/__init__.py:78-128`` ``compute_logits`` /
``compute_acc``; ``test_phase/test_few_shot.py:20-25`` 95% CI). All functions are
shape-polymorphic over a leading episode axis — episodes are vmapped/batched, not
Python-looped — and all matmuls are expressed so XLA lowers them onto the MXU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """Torch ``F.normalize`` semantics: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def compute_logits(
    feat: jax.Array,
    proto: jax.Array,
    metric: str = "dot",
    temp: jax.Array | float = 1.0,
) -> jax.Array:
    """Query-vs-prototype logits.

    feat:  (..., Q, C) queries, proto: (..., N, C) prototypes, any number of
    shared leading batch dims (the reference special-cases 2-D and 3-D;
    ``einsum`` covers both and any episode batching on top).

    metric: 'dot' | 'cos' | 'sqr' (negative squared distance).
    """
    if metric == "cos":
        feat = l2_normalize(feat)
        proto = l2_normalize(proto)
        metric = "dot"
    if metric == "dot":
        logits = jnp.einsum("...qc,...nc->...qn", feat, proto)
    elif metric == "sqr":
        diff = feat[..., :, None, :] - proto[..., None, :, :]
        logits = -jnp.sum(diff * diff, axis=-1)
    else:
        raise ValueError(f"unknown metric {metric!r}")
    return logits * temp


def compute_acc(logits: jax.Array, label: jax.Array) -> jax.Array:
    """Mean top-1 accuracy. logits (..., N), label (...,) int."""
    pred = jnp.argmax(logits, axis=-1)
    return jnp.mean((pred == label).astype(jnp.float32))


def per_episode_acc(logits: jax.Array, label: jax.Array) -> jax.Array:
    """Accuracy per episode: logits (E, Q, N), label (E, Q) -> (E,)."""
    pred = jnp.argmax(logits, axis=-1)
    return jnp.mean((pred == label).astype(jnp.float32), axis=-1)


def compute_logits_kshot(
    feat: jax.Array, proto: jax.Array, temp: jax.Array | float = 1.0
) -> jax.Array:
    """Per-shot cosine logits (reference ``compute_logits_kshot``,
    ``utils/__init__.py:103-106``): feat (B,M,K,C), proto (B,N,K,C) -> (B,N,K)."""
    return jnp.einsum(
        "bmkc,bnkc->bnk", l2_normalize(proto), l2_normalize(feat)
    ) * temp


def compute_logits_local_kshot(
    feat: jax.Array, proto: jax.Array, temp: jax.Array | float = 1.0
) -> jax.Array:
    """Mean local cosine similarity over the last-but-one axis (reference
    ``compute_logits_local_kshot``, ``utils/__init__.py:108-112``)."""
    cos = jnp.sum(l2_normalize(feat) * l2_normalize(proto), axis=-1)
    return jnp.mean(cos, axis=-1) * temp


def compute_acc_kshots(logits: jax.Array, label: jax.Array, shot: int = 5) -> jax.Array:
    """Max-over-shots accuracy (reference ``compute_acc_kshots``,
    ``utils/__init__.py:121-128``): logits (B, way*shot) -> per-class max."""
    per_class = jnp.max(logits.reshape(logits.shape[0], -1, shot), axis=-1)
    pred = jnp.argmax(per_class, axis=1)
    return jnp.mean((pred == label).astype(jnp.float32))


def softmax_kl_loss(
    input_logits: jax.Array, target_logits: jax.Array, matching: jax.Array
) -> jax.Array:
    """Masked softmax-KL (reference ``softmax_kl_loss``,
    ``utils/__init__.py:198-208``): KL(target || input) weighted by
    ``matching``, summed and normalized by the mask sum. Gradients flow to
    ``input_logits`` only."""
    logp = jax.nn.log_softmax(input_logits, axis=1)
    q = jax.lax.stop_gradient(jax.nn.softmax(target_logits, axis=1))
    kl = q * (jnp.log(jnp.clip(q, 1e-12)) - logp)
    return jnp.sum(kl * matching) / jnp.sum(matching)


def mean_confidence_interval(accs, confidence: float = 0.95):
    """(mean, halfwidth) of a Student-t confidence interval over episode accs.

    Matches ``test_phase/test_few_shot.py:20-25`` (scipy ``t.ppf`` based).
    Input is host-side (numpy or list); this runs once per eval, not in jit.
    """
    import numpy as np
    from scipy import stats

    a = np.asarray(accs, dtype=np.float64).reshape(-1)
    n = a.shape[0]
    m = float(np.mean(a))
    if n < 2:
        return m, 0.0
    se = float(stats.sem(a))
    h = se * float(stats.t.ppf((1 + confidence) / 2.0, n - 1))
    return m, h


def normal_confidence_interval(accs):
    """(mean, halfwidth) with the SUN-D reference's formula: ``1.96 *
    std / sqrt(n)`` with the POPULATION std (ddof=0) — ``meta_tuning_sun_d/
    Models/utils.py:62-72`` — not the Student-t interval the SUN-M test
    phase uses (``mean_confidence_interval``). Indistinguishable at the
    2000-episode protocol, but the SUN-D eval/train CLIs report this one so
    their printed numbers match the reference's bit-for-bit."""
    import numpy as np

    a = np.asarray(accs, dtype=np.float64).reshape(-1)
    m = float(np.mean(a))
    pm = 1.96 * float(np.std(a)) / np.sqrt(a.shape[0])
    return m, pm


def roc_auc(scores, labels) -> float:
    """Binary ROC-AUC (reference ``--sauc`` mode, ``test_few_shot.py:95-112``).

    scores: (M,) higher = more positive; labels: (M,) in {0, 1}. Host-side.
    """
    import numpy as np

    s = np.asarray(scores, dtype=np.float64).reshape(-1)
    y = np.asarray(labels).reshape(-1)
    # rank-based AUC (equivalent to sklearn.roc_auc_score, ties averaged)
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(s) + 1)
    # average ranks for ties
    sorted_s = s[order]
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and sorted_s[j + 1] == sorted_s[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = (i + 1 + j + 1) / 2.0
        i = j + 1
    n_pos = int(np.sum(y == 1))
    n_neg = len(y) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return float((np.sum(ranks[y == 1]) - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))
