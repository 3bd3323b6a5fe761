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


def _params_copy(params):
    return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)


def resume_train_state(resume_dir: str, state: "TrainState"):
    """Restore a full-train-state resume checkpoint, tolerating a toggled
    ``ema_decay`` between the save and the restart.

    The resume meta records whether the saved state carried an EMA shadow
    (``"ema": true/false``); if that disagrees with the current ``state``'s
    shape, the restore target is adapted and the shadow re-seeded from the
    loaded params (enabled after save) or dropped (disabled after save).
    Returns ``(state, meta, note)`` — ``note`` is a log line or None.
    """
    import json
    import os

    from ..checkpoint import load_variables

    want_ema = state.ema_params is not None
    saved_ema = None
    for p in (resume_dir, resume_dir + ".old"):
        mp = os.path.join(p, "meta.json")
        if os.path.exists(mp):
            try:
                with open(mp) as f:
                    # checkpoints from before the EMA feature have no "ema"
                    # key and never carry a shadow -> treat missing as False
                    saved_ema = json.load(f).get("ema", False)
            except (ValueError, OSError):
                pass
            break
    target = state
    if saved_ema is not None and bool(saved_ema) != want_ema:
        target = state.replace(
            ema_params=_params_copy(state.params) if saved_ema else None
        )
    state, meta = load_variables(resume_dir, target=target)
    note = None
    if want_ema and state.ema_params is None:
        state = state.replace(ema_params=_params_copy(state.params))
        note = ("resume: checkpoint carries no EMA shadow (ema_decay was "
                "enabled after the last save) — re-seeded it from the loaded params")
    elif not want_ema and state.ema_params is not None:
        state = state.replace(ema_params=None)
        note = "resume: dropping the checkpoint's EMA shadow (ema_decay now disabled)"
    return state, meta, note
