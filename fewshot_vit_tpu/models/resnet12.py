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
from .common import bn_use_running_average, global_avg_pool, kaiming_out_init, leaky_relu


def _res12_residual(x: jax.Array, planes: int, train: bool, dtype: Any,
                    fold_bn: bool = False) -> jax.Array:
    """Triple 3x3 conv-BN + 1x1 BN shortcut (shared by both block variants;
    called inside a compact scope, so the submodule names land in the
    caller's param tree unchanged). ``fold_bn=True``: frozen-stats BNs
    pre-folded into biased convs (``models/fold.py::fold_resnet12``)."""
    conv = lambda f, k, name: nn.Conv(
        f, (k, k), padding=k // 2, use_bias=fold_bn,
        kernel_init=kaiming_out_init, dtype=dtype, name=name,
    )
    if fold_bn:
        bn = lambda name: (lambda y: y)
    else:
        bn = lambda name: nn.BatchNorm(
            use_running_average=bn_use_running_average(train), momentum=0.9,
            epsilon=1e-5, dtype=dtype, name=name,
        )
    out = leaky_relu(bn("bn1")(conv(planes, 3, "conv1")(x)))
    out = leaky_relu(bn("bn2")(conv(planes, 3, "conv2")(out)))
    out = bn("bn3")(conv(planes, 3, "conv3")(out))
    identity = bn("downsample_bn")(conv(planes, 1, "downsample_conv")(x))
    return leaky_relu(out + identity)


class Res12Block(nn.Module):
    planes: int
    fold_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        out = _res12_residual(x, self.planes, train, self.dtype, self.fold_bn)
        return nn.max_pool(out, (2, 2), strides=(2, 2))


class ResNet12(nn.Module):
    channels: Sequence[int] = (64, 128, 256, 512)
    fold_bn: bool = False  # frozen-stats BNs pre-folded (models/fold.py)
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return self.channels[3]

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        for i, c in enumerate(self.channels):
            x = Res12Block(c, fold_bn=self.fold_bn, dtype=self.dtype,
                           name=f"layer{i + 1}")(x, train)
        return x, global_avg_pool(x)


@models.register("resnet12")
def resnet12(**kwargs: Any) -> ResNet12:
    return ResNet12(channels=(64, 128, 256, 512), **kwargs)


@models.register("resnet12-wide")
def resnet12_wide(**kwargs: Any) -> ResNet12:
    return ResNet12(channels=(64, 160, 320, 640), **kwargs)


class DropBlock(nn.Module):
    """Structured dropout: zero ``block_size``-square neighbourhoods around
    Bernoulli-sampled centres, rescaled by kept fraction (reference
    ``sun_meta_training/models/resnet_drop.py:8-65``; the reference's
    scatter-dilation is expressed as a max-pool here — same mask)."""

    block_size: int

    @nn.compact
    def __call__(self, x: jax.Array, gamma: jax.Array, train: bool) -> jax.Array:
        if not train:
            return x
        bs = self.block_size
        b, h, w, c = x.shape
        rng = self.make_rng("dropout")
        pts = jax.random.bernoulli(
            rng, gamma, (b, h - bs + 1, w - bs + 1, c)
        ).astype(x.dtype)
        lp, rp = (bs - 1) // 2, bs // 2
        pts = jnp.pad(pts, ((0, 0), (lp, rp), (lp, rp), (0, 0)))
        dilated = nn.max_pool(pts, (bs, bs), strides=(1, 1),
                              padding=((lp, rp), (lp, rp)))
        mask = 1.0 - dilated
        count = mask.size
        ones = jnp.sum(mask)
        return mask * x * (count / jnp.maximum(ones, 1.0))


class Res12DropBlock(nn.Module):
    """Drop-variant residual block (``resnet_drop.py:77-133``): triple conv +
    1x1 shortcut, optional 2x2 maxpool, then dropout (early layers) or
    DropBlock with a keep-rate ramp over seen batches (late layers)."""

    planes: int
    pool: bool = True
    drop_rate: float = 0.0
    drop_block: bool = False
    block_size: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        out = _res12_residual(x, self.planes, train, self.dtype)
        if self.pool:
            out = nn.max_pool(out, (2, 2), strides=(2, 2))
        if self.drop_rate > 0:
            # seen-batch counter (reference num_batches_tracked; counted on
            # train steps — the mutable passes that also update BN stats).
            # Skip the write when batch_stats is immutable (the frozen_bn
            # train paths apply without mutable=['batch_stats']): the
            # reference's freeze_bn likewise stops BN bookkeeping.
            tracked = self.variable("batch_stats", "num_batches_tracked",
                                    lambda: jnp.zeros((), jnp.float32))
            if (train and not self.is_initializing()
                    and self.is_mutable_collection("batch_stats")):
                tracked.value = tracked.value + 1.0
            if self.drop_block:
                fs = out.shape[1]
                bs = self.block_size
                keep = jnp.maximum(
                    1.0 - self.drop_rate / (20 * 2000) * tracked.value,
                    1.0 - self.drop_rate,
                )
                gamma = ((1.0 - keep) / bs ** 2 * fs ** 2
                         / (fs - bs + 1) ** 2)
                out = DropBlock(bs, name="drop")(out, gamma, train)
            else:
                out = nn.Dropout(self.drop_rate, deterministic=not train)(out)
        return out


class ResNet12Drop(nn.Module):
    """resnet12-drop (``resnet_drop.py:135-197``): wide channels, dropout on
    layers 1-2, DropBlock(5) on layers 3-4, NO pool on layer 4 (dense map is
    10x10 at 80px)."""

    channels: Sequence[int] = (64, 160, 320, 640)
    drop_rate: float = 0.1
    dropblock_size: int = 5
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return self.channels[3]

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        for i, c in enumerate(self.channels):
            x = Res12DropBlock(
                c, pool=i < 3, drop_rate=self.drop_rate,
                drop_block=i >= 2, block_size=self.dropblock_size,
                dtype=self.dtype, name=f"layer{i + 1}",
            )(x, train)
        return x, global_avg_pool(x)


@models.register("resnet12-drop")
def resnet12_drop(**kwargs: Any) -> ResNet12Drop:
    return ResNet12Drop(**kwargs)
