"""Episode reshaping as static, jit-friendly ops.

Replaces ``sun_meta_training/utils/few_shot.py:4-29``. Episodes are fixed-shape
arrays ``(E, way, shot+query, H, W, C)`` so the reshapes below are free under
XLA (no recompiles, no dynamic shapes).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def split_shot_query(
    data: jax.Array, way: int, shot: int, query: int, ep_per_batch: int = 1
) -> Tuple[jax.Array, jax.Array]:
    """Flat batch (E*way*(shot+query), ...img) -> shot (E,way,shot,...), query (E,way*query,...).

    Query is flattened way-major, matching the reference meta-tuning copy
    (``meta_tuning_sun_m/utils/few_shot.py:4-10``) and the label order of
    ``make_nk_label``. Index order must match the episodic sampler's emission
    order (episode-major, class-major, item-minor — see data.sampler).
    """
    img_shape = data.shape[1:]
    data = data.reshape(ep_per_batch, way, shot + query, *img_shape)
    x_shot = data[:, :, :shot]
    x_query = data[:, :, shot:].reshape(ep_per_batch, way * query, *img_shape)
    return x_shot, x_query


def make_nk_label(n: int, k: int, ep_per_batch: int = 1) -> jax.Array:
    """Query labels (E, n*k): class index repeated k times per class."""
    label = jnp.repeat(jnp.arange(n), k)
    return jnp.tile(label[None, :], (ep_per_batch, 1))


def flatten_episodes(x: jax.Array, keep_dims: int = 3) -> jax.Array:
    """(E, ..., *img) -> (prod(leading), *img) where img is the last keep_dims dims."""
    return x.reshape((-1,) + x.shape[-keep_dims:])
