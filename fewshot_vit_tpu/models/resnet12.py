"""ResNet-12 — the classic few-shot CNN baseline.

Behavioral spec from ``sun_meta_training/models/resnet12.py``: 4 stages, each a
single triple-conv residual block (3x3 convs + BN, LeakyReLU(0.1), 1x1+BN
shortcut) followed by 2x2 maxpool; returns ``(dense_map, mean-pooled)``.
80x80 -> 5x5 dense map. Registered: ``resnet12`` (64,128,256,512),
``resnet12-wide`` (64,160,320,640).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import models
from .common import global_avg_pool, kaiming_out_init, leaky_relu


class Res12Block(nn.Module):
    planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        conv = lambda f, k, name: nn.Conv(
            f, (k, k), padding=k // 2, use_bias=False,
            kernel_init=kaiming_out_init, dtype=self.dtype, name=name,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        out = leaky_relu(bn("bn1")(conv(self.planes, 3, "conv1")(x)))
        out = leaky_relu(bn("bn2")(conv(self.planes, 3, "conv2")(out)))
        out = bn("bn3")(conv(self.planes, 3, "conv3")(out))
        identity = bn("downsample_bn")(conv(self.planes, 1, "downsample_conv")(x))
        out = leaky_relu(out + identity)
        return nn.max_pool(out, (2, 2), strides=(2, 2))


class ResNet12(nn.Module):
    channels: Sequence[int] = (64, 128, 256, 512)
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return self.channels[3]

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        for i, c in enumerate(self.channels):
            x = Res12Block(c, dtype=self.dtype, name=f"layer{i + 1}")(x, train)
        return x, global_avg_pool(x)


@models.register("resnet12")
def resnet12(**kwargs: Any) -> ResNet12:
    return ResNet12(channels=(64, 128, 256, 512), **kwargs)


@models.register("resnet12-wide")
def resnet12_wide(**kwargs: Any) -> ResNet12:
    return ResNet12(channels=(64, 160, 320, 640), **kwargs)
