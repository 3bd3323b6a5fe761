"""Meta-Baseline cosine-centroid episodic head (SUN-M).

Re-design of ``sun_meta_training/models/meta_baseline.py:10-47``: shots and
queries are encoded in ONE batched pass (as the reference's ``torch.cat``),
prototypes are shot-means, logits are cosine (or negative-sqr) similarities at a
learnable temperature (init 10). Episodes are a leading batch axis — no
per-episode Python, everything inside one jitted program.

Shapes: x_shot (E, way, shot, H, W, 3), x_query (E, Q, H, W, 3) -> (E, Q, way).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import models
from ..ops.metric import compute_logits


class MetaBaseline(nn.Module):
    encoder: nn.Module
    method: str = "cos"
    temp: float = 10.0
    temp_learnable: bool = True

    # Implements the standard episodic contract the meta-tune/eval loops
    # drive: (x_shot (E,way,shot,...), x_query (E,Q,...)) -> (E,Q,way) logits.
    standard_episodic = True

    @nn.compact
    def __call__(
        self, x_shot: jax.Array, x_query: jax.Array, train: bool = False
    ) -> jax.Array:
        e, way, shot = x_shot.shape[:3]
        q = x_query.shape[1]
        img = x_shot.shape[3:]

        x_all = jnp.concatenate(
            [x_shot.reshape((-1,) + img), x_query.reshape((-1,) + img)], axis=0
        )
        _, pooled = self.encoder(x_all, train)
        n_shot = e * way * shot
        feat_shot = pooled[:n_shot].reshape(e, way, shot, -1)
        feat_query = pooled[n_shot:].reshape(e, q, -1)

        if self.temp_learnable:
            temp = self.param("temp", lambda k: jnp.array(self.temp, jnp.float32))
        else:
            temp = self.temp

        proto = feat_shot.mean(axis=2)  # (E, way, C)
        metric = "cos" if self.method == "cos" else "sqr"
        return compute_logits(
            feat_query.astype(jnp.float32), proto.astype(jnp.float32), metric, temp
        )


@models.register("meta-baseline")
def make_meta_baseline(
    encoder: str,
    encoder_args: Optional[dict] = None,
    method: str = "cos",
    temp: float = 10.0,
    temp_learnable: bool = True,
    dtype: Any = jnp.float32,
) -> MetaBaseline:
    enc = models.make(encoder, dtype=dtype, **(encoder_args or {}))
    return MetaBaseline(
        encoder=enc, method=method, temp=temp, temp_learnable=temp_learnable
    )
