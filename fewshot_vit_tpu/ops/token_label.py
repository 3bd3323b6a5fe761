"""SUN self-promoted supervision: teacher patch logits -> soft token labels.

Pure-jnp re-design of ``sun_meta_training/offline.py:34-76``
(``SoftTargetCrossEntropy`` and ``generate_softlabel``). Semantics preserved
exactly; layout is NHWC/(B,T,C) token-major so the whole loss fuses into the
jitted train step (the reference runs this on flattened NCHW tensors).

Definitions (matching the reference):
  * off = smoothing / C, on = 1 - smoothing + off   (C = number of base classes;
    note off uses C, not C+1, exactly as ``offline.py:58-60``).
  * each patch's label over C+1 classes is `off` everywhere and `on` at the
    teacher's top-k classes;
  * the ``bg`` patches with the lowest max-logit ("least salient") instead get
    `on` at the background class C.

One evident reference defect is fixed here (proof by execution:
``tests/test_ops.py::TestSoftLabel::test_reference_bg_label_defect_proof``):
``offline.py:71`` fills ``bg_map`` with ``c`` taken from
``logits_max.size(1)`` — which is **1** after the ``max(dim=1,
keepdim=True)`` at :61-62 — so the reference actually scatters background
tokens onto REAL CLASS 1, not the background class ``n_classes`` that the
(C+1)-wide label tensor (:73-74) and the ``n_classes+1`` ``classifier_local``
allocation (token_label.py:43) exist for. This port labels them class C (the
evident intent); the trajectory test compares against the reference with
exactly that one index moved (``tests/test_trajectory_parity.py::
TestSunTrajectory``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def generate_soft_label(
    logits: jax.Array,
    smoothing: float = 0.1,
    k: int = 5,
    bg_tokens: int = 10,
) -> jax.Array:
    """Teacher patch logits (B, T, C) -> soft labels (B, T, C+1).

    T = number of patch tokens (H*W flattened), C = base-class count.
    ``bg_tokens`` patches per image with the lowest max-logit are labeled as the
    extra background class C (reference ``bp=bg_token_num``, default 10).
    """
    b, t, c = logits.shape
    if not 0 <= bg_tokens < t:
        raise ValueError(f"bg_tokens={bg_tokens} must be in [0, {t}) for {t} patch tokens")
    if not 0 < k <= c:
        raise ValueError(f"k={k} must be in (0, {c}] for {c} classes")
    off = smoothing / c
    on = 1.0 - smoothing + off

    # Foreground mask: the (T - bg) most salient patches keep class labels.
    # Index sets are materialized as one-hot broadcast-compares reduced on the
    # VPU, not scatters (`.at[].set`) — scatters serialize on TPU, and these
    # run inside every phase-2 train step. top_k indices are distinct, so the
    # one-hot sum is bit-identical to the scatter.
    saliency = jnp.max(logits, axis=-1)  # (B, T)
    _, keep_idx = jax.lax.top_k(saliency, t - bg_tokens)  # (B, T-bg)
    fg_mask = jnp.sum(
        jax.nn.one_hot(keep_idx, t, dtype=logits.dtype), axis=1
    )  # (B, T) 1=foreground

    # Top-k class one-hot per patch, over C+1 classes (background never in top-k).
    _, top_idx = jax.lax.top_k(logits, k)  # (B, T, k)
    topk_hot = jnp.sum(
        jax.nn.one_hot(top_idx, c + 1, dtype=logits.dtype), axis=2
    )  # (B, T, C+1)

    fg_label = off + topk_hot * (on - off)  # (B, T, C+1)
    bg_label = jnp.full((c + 1,), off, logits.dtype).at[c].set(on)  # (C+1,)

    m = fg_mask[..., None]
    return fg_label * m + bg_label[None, None, :] * (1.0 - m)


def soft_target_cross_entropy(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Mean over tokens of sum(-target * log_softmax(logits)).

    logits, target: (..., C). Matches ``offline.py:34-45`` (without the
    repeat-broadcast branch — shapes are static here).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.sum(target * logp, axis=-1)
    return jnp.mean(loss)
