"""ResNet-18/50 (torchvision-style) with the dual-output forward.

Behavioral spec from ``sun_meta_training/models/resnet.py``: standard
BasicBlock/Bottleneck ResNet — 7x7/s2 stem + 3x3/s2 maxpool, four stages, and
``forward -> (dense_map, avg-pooled)`` (``:185-200``). NHWC, flax.
Registered: ``resnet18`` (BasicBlock [2,2,2,2], out 512), ``resnet50``
(Bottleneck [3,4,6,3], out 2048).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import models
from .common import bn_use_running_average, global_avg_pool, kaiming_out_init


def _conv(f: int, k: int, stride: int, name: str, dtype) -> nn.Conv:
    return nn.Conv(
        f, (k, k), strides=stride, padding=k // 2, use_bias=False,
        kernel_init=kaiming_out_init, dtype=dtype, name=name,
    )


def _bn(train: bool, name: str, dtype) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=bn_use_running_average(train), momentum=0.9, epsilon=1e-5,
        dtype=dtype, name=name,
    )


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32
    expansion = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        out = nn.relu(_bn(train, "bn1", self.dtype)(
            _conv(self.planes, 3, self.stride, "conv1", self.dtype)(x)))
        out = _bn(train, "bn2", self.dtype)(
            _conv(self.planes, 3, 1, "conv2", self.dtype)(out))
        identity = x
        if self.has_downsample:
            identity = _bn(train, "downsample_bn", self.dtype)(
                _conv(self.planes, 1, self.stride, "downsample_conv", self.dtype)(x))
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32
    expansion = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        width = self.planes
        out = nn.relu(_bn(train, "bn1", self.dtype)(
            _conv(width, 1, 1, "conv1", self.dtype)(x)))
        out = nn.relu(_bn(train, "bn2", self.dtype)(
            _conv(width, 3, self.stride, "conv2", self.dtype)(out)))
        out = _bn(train, "bn3", self.dtype)(
            _conv(width * 4, 1, 1, "conv3", self.dtype)(out))
        identity = x
        if self.has_downsample:
            identity = _bn(train, "downsample_bn", self.dtype)(
                _conv(width * 4, 1, self.stride, "downsample_conv", self.dtype)(x))
        return nn.relu(out + identity)


class ResNet(nn.Module):
    layers: Sequence[int] = (2, 2, 2, 2)
    bottleneck: bool = False
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return 512 * (4 if self.bottleneck else 1)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        block_cls = Bottleneck if self.bottleneck else BasicBlock
        expansion = block_cls.expansion

        x = _conv(64, 7, 2, "conv1", self.dtype)(x)
        x = nn.relu(_bn(train, "bn1", self.dtype)(x))
        # torch MaxPool2d(3, stride=2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        inplanes = 64
        for stage, (planes, n_blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                s = stride if b == 0 else 1
                need_ds = b == 0 and (s != 1 or inplanes != planes * expansion)
                x = block_cls(
                    planes, stride=s, has_downsample=need_ds, dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
                inplanes = planes * expansion
        return x, global_avg_pool(x)


@models.register("resnet18")
def resnet18(**kwargs: Any) -> ResNet:
    return ResNet(layers=(2, 2, 2, 2), bottleneck=False, **kwargs)


@models.register("resnet50")
def resnet50(**kwargs: Any) -> ResNet:
    return ResNet(layers=(3, 4, 6, 3), bottleneck=True, **kwargs)
