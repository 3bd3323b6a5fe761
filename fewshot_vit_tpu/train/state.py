"""Functional train state (params + batch_stats + optimizer state)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    # EMA shadow of params (reference ModelEma, utils/__init__.py:174-196);
    # None disables it.
    ema_params: Any = None

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation, ema: bool = False):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            # real copies: the epoch programs donate the state, and aliased
            # params/ema buffers would be donated twice
            ema_params=(jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
                        if ema else None),
        )

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def ema_update(ema_params, params, decay: float = 0.9997):
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )
