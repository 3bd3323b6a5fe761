"""Shared building blocks for the encoder zoo.

All encoders follow the universal contract of the reference zoo
(``sun_meta_training/models/*.py``): ``encoder(x) -> (dense_map, pooled)`` with
an ``out_dim`` attribute — except here the dense map is **NHWC** (TPU-native
layout; the reference is NCHW) and encoders are flax modules applied functionally.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

# --- frozen-BN context ---------------------------------------------------------
# The reference's `utils.freeze_bn` puts ONLY BatchNorm modules in eval mode
# while the model stays in train mode (meta_tuning_sun_m/utils/__init__.py):
# dropout/droppath stay stochastic, BN normalizes with running stats and never
# updates them. flax decides `use_running_average` at module construction, so
# the zoo's BN sites consult this trace-time contextvar instead of `not train`
# alone. Static under jit: the flag is read while the wrapped `apply` traces.
_BN_FROZEN: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "fewshot_vit_bn_frozen", default=False)


@contextlib.contextmanager
def frozen_bn():
    """Within this context every zoo BatchNorm runs in eval mode regardless
    of the `train` flag (wrap the `.apply(...)` call, i.e. trace time)."""
    token = _BN_FROZEN.set(True)
    try:
        yield
    finally:
        _BN_FROZEN.reset(token)


def bn_use_running_average(train: bool) -> bool:
    """`use_running_average` for a zoo BatchNorm: eval mode when not training
    OR when inside `frozen_bn()` (the reference's freeze_bn semantics)."""
    return (not train) or _BN_FROZEN.get()

# torch nn.GELU default is the exact erf formulation; jax.nn.gelu defaults to
# the tanh approximation, so pin approximate=False everywhere for parity.
def gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def leaky_relu(x: jax.Array, negative_slope: float = 0.1) -> jax.Array:
    # torch nn.LeakyReLU(0.1), the resnet12 reference default (jax's is 0.01)
    return jax.nn.leaky_relu(x, negative_slope)


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
            use_running_average=bn_use_running_average(train),
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)


def global_avg_pool(x: jax.Array) -> jax.Array:
    """NHWC (B,H,W,C) -> (B,C), the reference's AdaptiveAvgPool2d(1)."""
    return jnp.mean(x, axis=(1, 2))
