"""Whole-classification heads (teacher pretraining / SUN global classifier).

Re-design of ``sun_train_teacher/models/classifier.py:11-54``. Heads are flax
modules around an encoder submodule; ``in_dim`` is inferred by shape (no
explicit plumbing like the reference's ``classifier_args['in_dim']``).
Submodule names (``encoder``, ``classifier.linear``) deliberately mirror the
torch attribute paths so checkpoint conversion is mechanical.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import models
from ..ops.metric import compute_logits


class LinearClassifier(nn.Module):
    """Plain linear head (reference ``classifier.py:27-35``)."""

    n_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(self.n_classes, dtype=self.dtype, name="linear")(x)


class NNClassifier(nn.Module):
    """Learnable-prototype metric head (reference ``classifier.py:38-54``)."""

    n_classes: int
    in_dim: int
    metric: str = "cos"
    temp: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        proto = self.param(
            "proto",
            nn.initializers.kaiming_uniform(),
            (self.n_classes, self.in_dim),
        )
        if self.temp is None and self.metric == "cos":
            temp = self.param("temp", lambda k: jnp.array(10.0, jnp.float32))
        else:
            temp = self.temp if self.temp is not None else 1.0
        return compute_logits(x, proto.astype(x.dtype), self.metric, temp)


class Classifier(nn.Module):
    """Encoder + global classifier on the pooled feature (reference ``:11-24``)."""

    encoder: nn.Module
    classifier: nn.Module

    # Whole-classification signature (x, train), not the episodic
    # (x_shot, x_query) contract (see train/meta_tune.py's check).
    standard_episodic = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        _, pooled = self.encoder(x, train)
        return self.classifier(pooled)


@models.register("classifier")
def make_classifier(
    encoder: str,
    encoder_args: Optional[dict] = None,
    classifier: str = "linear-classifier",
    classifier_args: Optional[dict] = None,
    dtype: Any = jnp.float32,
) -> Classifier:
    enc = models.make(encoder, dtype=dtype, **(encoder_args or {}))
    cargs = dict(classifier_args or {})
    if classifier == "linear-classifier":
        head: nn.Module = LinearClassifier(dtype=dtype, name="classifier", **cargs)
    elif classifier == "nn-classifier":
        cargs.setdefault("in_dim", enc.out_dim)
        head = NNClassifier(dtype=dtype, name="classifier", **cargs)
    else:
        raise ValueError(f"unknown classifier {classifier!r}")
    return Classifier(encoder=enc, classifier=head)
