"""LV-ViT — token-labeling ViT with conv stem and scaled residuals.

Behavioral spec from ``sun_meta_training/models/lvvit.py``: residual 3-conv
stem at 96 hidden channels + maxpool + 4x4/s4 projection (stride 16 total,
``:277-317``), cls token + (N+1) pos embed, pre-LN blocks whose residual
branches are divided by ``skip_lam`` (2.0 for the lvvit family, ``:152-155``),
qkv WITHOUT bias, mlp_ratio 3; forward returns ``(patch map 5x5, cls token)``
(``:529-553``). Registered: ``lvvit_micro_80`` = embed 384, depth 8, heads 6,
drop_path 0.5 linear decay (``:583-589``).

(The upstream LV-ViT mix-token / dense aux-head training tricks are commented
out in the reference and therefore out of scope; the SUN pipeline supplies its
own token supervision.)
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import models
from .common import bn_use_running_average, DropPath, gelu, leaky_relu, trunc_normal_init
from .deit import ViTAttention


class LVViTStem(nn.Module):
    """Residual 3-conv stem (hidden channels) + maxpool + 4x4 proj (``:277-317``)."""

    hidden: int
    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        bn = lambda name: nn.BatchNorm(
            use_running_average=bn_use_running_average(train), momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=s, padding=k // 2, use_bias=False,
            kernel_init=trunc_normal_init(0.02), dtype=self.dtype, name=name,
        )
        out = leaky_relu(bn("bn1")(conv(self.hidden, 3, 2, "conv1")(x)))
        out = leaky_relu(bn("bn2")(conv(self.hidden, 3, 1, "conv2")(out)))
        out = bn("bn3")(conv(self.hidden, 3, 1, "conv3")(out))
        identity = bn("downsample_bn")(conv(self.hidden, 3, 2, "downsample_conv")(x))
        out = leaky_relu(out + identity)
        out = nn.max_pool(out, (2, 2), strides=(2, 2))
        return nn.Conv(self.embed_dim, (4, 4), strides=4, padding="VALID",
                       dtype=self.dtype, name="proj")(out)


class LVViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 3.0
    skip_lam: float = 2.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        dp = DropPath(self.drop_path, name="drop_path")
        y = ViTAttention(self.dim, self.num_heads, self.qkv_bias,
                         self.attn_drop, self.drop, dtype=self.dtype,
                         name="attn")(ln("norm1")(x), train)
        x = x + dp(y, deterministic=not train) / self.skip_lam
        h = ln("norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        drop = nn.Dropout(self.drop, deterministic=not train)
        h = drop(gelu(nn.Dense(hidden, kernel_init=trunc_normal_init(0.02),
                               dtype=self.dtype, name="mlp_fc1")(h)))
        h = drop(nn.Dense(self.dim, kernel_init=trunc_normal_init(0.02),
                          dtype=self.dtype, name="mlp_fc2")(h))
        return x + dp(h, deterministic=not train) / self.skip_lam


class LVViT(nn.Module):
    img_size: int = 80
    embed_dim: int = 384
    depth: int = 8
    num_heads: int = 6
    mlp_ratio: float = 3.0
    skip_lam: float = 2.0
    stem_hidden: int = 96
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.5
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return self.embed_dim

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        b = x.shape[0]
        x = LVViTStem(self.stem_hidden, self.embed_dim,
                      dtype=self.dtype, name="patch_embed")(x, train)
        g = x.shape[1]
        n = g * g
        x = x.reshape(b, n, self.embed_dim)
        cls = self.param("cls_token", trunc_normal_init(0.02), (1, 1, self.embed_dim))
        pos = self.param("pos_embed", trunc_normal_init(0.02), (1, n + 1, self.embed_dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.embed_dim)), x], 1)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x + pos)

        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1) for i in range(self.depth)]
        for i in range(self.depth):
            x = LVViTBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                           self.skip_lam, False, self.drop_rate,
                           self.attn_drop_rate, dpr[i], dtype=self.dtype,
                           name=f"blocks_{i}")(x, train)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        feat = x[:, 1:].reshape(b, g, g, self.embed_dim)
        return feat, x[:, 0]


@models.register("lvvit_micro_80")
def lvvit_micro_80(**kwargs: Any) -> LVViT:
    return LVViT(img_size=80, embed_dim=384, depth=8, num_heads=6,
                 mlp_ratio=3.0, skip_lam=2.0, drop_path_rate=0.5, **kwargs)
