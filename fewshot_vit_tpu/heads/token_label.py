"""SUN token-label student/teacher head and its episodic-eval variant.

Re-design of ``sun_meta_training/models/token_label.py:36-104``:

  * ``TokenLabel``: encoder + global classifier (C classes) + local token
    classifier (C+1 classes, background included). ``is_teacher=True`` routes
    the dense map through the *global* classifier (the teacher labels patches
    with base classes only). Token logits stay NHWC (B, H, W, C') — the
    reference permutes back to NCHW, which is pure layout noise on TPU.
  * ``TokenLabelEpisodic``: eval head combining dense top-1 local cosine
    similarity with global cosine prototype logits (temp 10).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import models
from ..ops.metric import compute_logits, l2_normalize
from .classifier import LinearClassifier


class TokenLabel(nn.Module):
    encoder: nn.Module
    n_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, is_teacher: bool = False
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        dense, pooled = self.encoder(x, train)
        classifier = LinearClassifier(self.n_classes, dtype=self.dtype, name="classifier")
        classifier_local = LinearClassifier(
            self.n_classes + 1, dtype=self.dtype, name="classifier_local"
        )
        y_token = classifier(dense) if is_teacher else classifier_local(dense)
        y = classifier(pooled)
        return y_token, y, pooled


class TokenLabelEpisodic(nn.Module):
    """Episodic eval for SUN checkpoints (reference ``token_label.py:62-104``).

    Returns (local_logits, cls_logits): local = mean-over-shots of per-class
    top-1 patch cosine similarity; cls = cosine prototype logits at temp 10.
    """

    encoder: nn.Module
    temp: float = 10.0

    @nn.compact
    def __call__(
        self, x_shot: jax.Array, x_query: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        e, way, shot = x_shot.shape[:3]
        q = x_query.shape[1]
        img = x_shot.shape[3:]

        x_all = jnp.concatenate(
            [x_shot.reshape((-1,) + img), x_query.reshape((-1,) + img)], axis=0
        )
        dense, pooled = self.encoder(x_all, train)
        c = dense.shape[-1]
        t = dense.shape[1] * dense.shape[2]
        n_shot = e * way * shot

        feat_shot = dense[:n_shot].reshape(e, way, shot * t, c)
        feat_query = dense[n_shot:].reshape(e, q, t, c)
        fs = l2_normalize(feat_shot.astype(jnp.float32))
        fq = l2_normalize(feat_query.astype(jnp.float32))
        # Per query patch: best cosine match over ALL support patches of a
        # class; average over query patches -> (E, Q, way). This is the
        # *documented intent* of the reference head — its code is broken dead
        # research code: ``sun_meta_training/token_label.py:89`` reshapes
        # feat_query as the support, the local branch (:89-95) only typechecks
        # for a 5-dim flat query while the cls reshape (:103) assumes a 6-dim
        # (b, way, q_per) query, so NO input rank lets the reference forward
        # complete (verified by execution in tests/test_heads_eval.py). We
        # implement the intended local top-1 matching directly; the cls branch
        # is parity-anchored line-by-line against the reference's cls-path
        # code at the rank it assumes.
        sim = jnp.einsum("eqtc,enkc->eqntk", fq, fs)  # (E, Q, way, T, shot*T)
        local = jnp.mean(jnp.max(sim, axis=-1), axis=-1)  # (E, Q, way)

        pooled_shot = pooled[:n_shot].reshape(e, way, shot, -1).mean(axis=2)
        pooled_query = pooled[n_shot:].reshape(e, q, -1)
        cls_logits = compute_logits(
            pooled_query.astype(jnp.float32),
            pooled_shot.astype(jnp.float32),
            "cos",
            self.temp,
        )
        return local, cls_logits


@models.register("token-label")
def make_token_label(
    encoder: str,
    encoder_args: Optional[dict] = None,
    classifier: str = "linear-classifier",
    classifier_args: Optional[dict] = None,
    dtype: Any = jnp.float32,
) -> TokenLabel:
    if classifier != "linear-classifier":
        raise ValueError("token-label head supports linear-classifier only")
    n_classes = int((classifier_args or {})["n_classes"])
    enc = models.make(encoder, dtype=dtype, **(encoder_args or {}))
    return TokenLabel(encoder=enc, n_classes=n_classes, dtype=dtype)


@models.register("token-label-ep")
def make_token_label_ep(
    encoder: str,
    encoder_args: Optional[dict] = None,
    temp: float = 10.0,
    dtype: Any = jnp.float32,
    **_: Any,
) -> TokenLabelEpisodic:
    enc = models.make(encoder, dtype=dtype, **(encoder_args or {}))
    return TokenLabelEpisodic(encoder=enc, temp=temp)
