"""DeiT / plain ViT with cls token, returning ``(patch_map, cls)``.

Behavioral spec from ``sun_meta_training/models/deit.py``: standard pre-LN ViT
(LayerNorm eps 1e-6, qkv_bias=True), cls token + learned (N+1)-token pos embed;
forward returns the normed patch tokens reshaped to a spatial map plus the cls
token (``deit.py:202-219``). Registered: the 224px tiny/small/base trio plus the
84px few-shot variants ``deit_nano_patch6_84`` (embed 224, heads 4) and
``deit_micro_patch6_84`` (embed 272).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import models
from .common import DropPath, gelu, trunc_normal_init


class ViTAttention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias,
                       kernel_init=trunc_normal_init(0.02),
                       dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, hd)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, c)
        out = nn.Dense(c, kernel_init=trunc_normal_init(0.02),
                       dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=name)
        dp = DropPath(self.drop_path, name="drop_path")
        y = ViTAttention(self.dim, self.num_heads, self.qkv_bias,
                         self.attn_drop, self.drop, dtype=self.dtype, name="attn")(
            ln("norm1")(x), train)
        x = x + dp(y, deterministic=not train)
        h = ln("norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        drop = nn.Dropout(self.drop, deterministic=not train)
        h = drop(gelu(nn.Dense(hidden, kernel_init=trunc_normal_init(0.02),
                               dtype=self.dtype, name="mlp_fc1")(h)))
        h = drop(nn.Dense(self.dim, kernel_init=trunc_normal_init(0.02),
                          dtype=self.dtype, name="mlp_fc2")(h))
        return x + dp(h, deterministic=not train)


class VisionTransformer(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return self.embed_dim

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        b = x.shape[0]
        g = self.img_size // self.patch_size
        n = g * g
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=self.patch_size, padding="VALID",
                    kernel_init=trunc_normal_init(0.02),
                    dtype=self.dtype, name="patch_embed")(x)
        x = x.reshape(b, n, self.embed_dim)
        cls = self.param("cls_token", trunc_normal_init(0.02), (1, 1, self.embed_dim))
        pos = self.param("pos_embed", trunc_normal_init(0.02), (1, n + 1, self.embed_dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.embed_dim)), x], axis=1)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x + pos)

        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1) for i in range(self.depth)]
        for i in range(self.depth):
            x = ViTBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                         self.qkv_bias, self.drop_rate, self.attn_drop_rate,
                         dpr[i], dtype=self.dtype, name=f"blocks_{i}")(x, train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        feat = x[:, 1:].reshape(b, g, g, self.embed_dim)
        return feat, x[:, 0]


def _reg(name: str, **cfg: Any) -> None:
    @models.register(name)
    def ctor(**kwargs: Any) -> VisionTransformer:
        return VisionTransformer(**{**cfg, **kwargs})


_reg("deit_tiny_patch16_224", patch_size=16, embed_dim=192, depth=12, num_heads=3)
_reg("deit_small_patch16_224", patch_size=16, embed_dim=384, depth=12, num_heads=6)
_reg("deit_base_patch16_224", patch_size=16, embed_dim=768, depth=12, num_heads=12)
_reg("deit_nano_patch16_224", patch_size=16, embed_dim=224, depth=12, num_heads=4)
_reg("deit_nano_patch6_84", img_size=84, patch_size=6, embed_dim=224, depth=12, num_heads=4)
_reg("deit_micro_patch6_84", img_size=84, patch_size=6, embed_dim=272, depth=12, num_heads=4)
