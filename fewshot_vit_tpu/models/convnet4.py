"""ConvNet-4 — the legacy Meta-Baseline encoder.

Spec from ``sun_meta_training/models/convnet4.py``: four (conv3x3 + BN + ReLU +
maxpool2) blocks, hid/z dim 64; the reference returns ONLY the flattened
1600-d feature (single-output legacy contract). Here we return the universal
``(dense_map, flattened)`` pair — heads use the second element, preserving the
reference's behavior, while the dense map is available for token heads.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import models
from .common import bn_use_running_average


class ConvNet4(nn.Module):
    hid_dim: int = 64
    z_dim: int = 64
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        # z_dim channels x 5x5 map (four /2 pools of an 80x80 input — the
        # only resolution this framework feeds ConvNet-4, as the reference)
        return self.z_dim * 25

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        dims = [self.hid_dim] * 3 + [self.z_dim]
        for i, d in enumerate(dims):
            x = nn.Conv(d, (3, 3), padding=1, dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(
                use_running_average=bn_use_running_average(train), momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"bn{i}",
            )(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # flattened in torch NCHW order (C, H, W) for checkpoint compatibility
        flat = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        return x, flat


@models.register("convnet4")
def convnet4(**kwargs: Any) -> ConvNet4:
    return ConvNet4(**kwargs)
