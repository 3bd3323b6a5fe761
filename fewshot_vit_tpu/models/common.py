"""Shared building blocks for the encoder zoo.

All encoders follow the universal contract of the reference zoo
(``sun_meta_training/models/*.py``): ``encoder(x) -> (dense_map, pooled)`` with
an ``out_dim`` attribute — except here the dense map is **NHWC** (TPU-native
layout; the reference is NCHW) and encoders are flax modules applied functionally.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.GELU default is the exact erf formulation; jax.nn.gelu defaults to
# the tanh approximation, so pin approximate=False everywhere for parity.
def gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def leaky_relu(x: jax.Array, negative_slope: float = 0.1) -> jax.Array:
    return jnp.where(x >= 0, x, negative_slope * x)


def trunc_normal_init(std: float = 0.02):
    """timm-style trunc normal (±2σ cut), matching the reference init."""
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


# Kaiming normal, fan_out, relu gain — torch nn.init.kaiming_normal_(mode='fan_out')
kaiming_out_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference ``visformer.py:89-106``)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        key = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(key, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class BatchNorm(nn.Module):
    """BatchNorm2d over NHWC with torch-default hyperparams (eps 1e-5, mom 0.1)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)


def global_avg_pool(x: jax.Array) -> jax.Array:
    """NHWC (B,H,W,C) -> (B,C), the reference's AdaptiveAvgPool2d(1)."""
    return jnp.mean(x, axis=(1, 2))
