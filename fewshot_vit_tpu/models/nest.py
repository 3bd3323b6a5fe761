"""NesT — hierarchical nested transformer (blocked local attention).

Behavioral spec from ``sun_meta_training/models/nest.py`` and
``nest_resembed.py``:
  * patch embed (4x4 conv) -> 3 levels with [16, 4, 1] non-overlapping image
    blocks of a fixed per-block sequence length (25 tokens at 80px);
  * each level: optional ConvPool aggregation (3x3 conv + channel LayerNorm +
    3x3/s2 maxpool, ``nest.py:116-130``), per-level pos embed (1, T, N, C),
    pre-LN transformer layers with attention over the block-local token axis
    (``:57-90``), blockify/deblockify reshapes (``:135-163``);
  * final channel LayerNorm, ``forward -> (dense_map, avg_pool)`` (``:323-337``);
  * ``resembed`` variant replaces the patch embed with a residual conv stem
    (7x7/s2 -> 1x1 -> 3x3, maxpool shortcut; ``nest_resembed.py:63-100``).

TPU-first: NHWC throughout, so blockify is a pure reshape/transpose and the
blocked attention is one 5-D einsum — exactly the layout the original JAX NesT
used, which the reference reshapes NCHW<->NHWC around every level.

Registered: ``nest_nano_80`` (96/192/384, heads 3/6/12, depths 2/3/3),
``nest_micro_80`` (128/384/512, heads 4/12/16, depths 2/2/2),
``nest_micro_resembed_80`` (micro dims + residual conv stem). Default
drop_path_rate 0.5 as in the reference constructors.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import models
from .common import DropPath, gelu, trunc_normal_init


def blockify(x: jax.Array, block_size: int) -> jax.Array:
    """(B, H, W, C) -> (B, T, N, C) non-overlapping square blocks."""
    b, h, w, c = x.shape
    gh, gw = h // block_size, w // block_size
    x = x.reshape(b, gh, block_size, gw, block_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, block_size * block_size, c)


def deblockify(x: jax.Array, block_size: int) -> jax.Array:
    """(B, T, N, C) -> (B, H, W, C)."""
    b, t, n, c = x.shape
    grid = int(math.sqrt(t))
    x = x.reshape(b, grid, grid, block_size, block_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, grid * block_size, grid * block_size, c)


class NestAttention(nn.Module):
    """MHSA over the block-local token axis of (B, T, N, C)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        b, t, n, c = x.shape
        h = self.num_heads
        hd = c // h
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias,
                       kernel_init=trunc_normal_init(0.02),
                       dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, t, n, 3, h, hd)
        q, k, v = jnp.moveaxis(qkv, 3, 0)  # each (B, T, N, h, hd)
        attn = jnp.einsum("btqhd,btkhd->bthqk", q, k) * (hd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        # real attention capture (see visformer.Attention): no-op unless the
        # caller makes the "intermediates" collection mutable
        self.sow("intermediates", "attn", attn)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        # NB: the reference merges heads head-dim-MAJOR — ``(attn@v).permute(
        # 0,2,3,4,1).reshape(B,T,N,C)`` (``nest.py:86``), i.e. channel = d*H+h,
        # unlike the standard (h, d) merge — keep it for weight compatibility
        out = jnp.einsum("bthqk,btkhd->btqdh", attn, v).reshape(b, t, n, c)
        out = nn.Dense(c, kernel_init=trunc_normal_init(0.02),
                       dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


def _gpsa_rel_indices(n: int) -> jnp.ndarray:
    """(N, N, 3) per-block relative coordinates (dx, dy, d^2) — the ConViT
    positional features (reference ``nest_gpsa.py:129-141``)."""
    import numpy as np

    g = int(math.sqrt(n))
    ind = np.arange(g)[None, :] - np.arange(g)[:, None]  # (g, g)
    indx = np.tile(ind, (g, g))
    indy = np.repeat(np.repeat(ind, g, axis=0), g, axis=1)
    rel = np.stack([indx, indy, indx ** 2 + indy ** 2], axis=-1)
    return jnp.asarray(rel, jnp.float32)


class NestGPSA(nn.Module):
    """Gated positional self-attention over block-local tokens (reference
    ``nest_gpsa.py:56-141`` — ConViT GPSA adapted to NesT's (B, T, N, C)).

    attn = (1-sigmoid(g)) * softmax(q k^T) + sigmoid(g) * softmax(pos_proj(rel)),
    renormalized; NB the reference's head merge ``(attn@v).transpose(1,2)
    .reshape(B,T,N,C)`` flattens (H, N, d) head-major — replicated exactly for
    weight compatibility."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        b, t, n, c = x.shape
        h = self.num_heads
        hd = c // h
        dense = lambda f, bias, name: nn.Dense(
            f, use_bias=bias, kernel_init=trunc_normal_init(0.02),
            dtype=self.dtype, name=name,
        )
        qk = dense(2 * c, self.qkv_bias, "qk")(x).reshape(b, t, n, 2, h, hd)
        q, k = jnp.moveaxis(qk, 3, 0)  # (B, T, N, h, hd)
        v = dense(c, self.qkv_bias, "v")(x).reshape(b, t, n, h, hd)

        patch = jnp.einsum("btqhd,btkhd->bhtqk", q, k) * (hd ** -0.5)
        patch = jax.nn.softmax(patch, axis=-1)
        rel = _gpsa_rel_indices(n)  # (N, N, 3) static
        pos = nn.Dense(h, kernel_init=trunc_normal_init(0.02),
                       dtype=self.dtype, name="pos_proj")(rel)  # (N, N, h)
        pos = jax.nn.softmax(pos.transpose(2, 0, 1), axis=-1)  # (h, N, N)
        gate = jax.nn.sigmoid(
            self.param("gating_param", nn.initializers.ones, (h,))
        ).reshape(1, h, 1, 1, 1)
        attn = (1.0 - gate) * patch + gate * pos[None, :, None].astype(patch.dtype)
        attn = attn / attn.sum(axis=-1, keepdims=True)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = jnp.einsum("bhtqk,btkhd->bhtqd", attn, v)
        # torch: (B,H,T,N,d).transpose(1,2).reshape(B,T,N,C) — head-major flat
        out = out.transpose(0, 2, 1, 3, 4).reshape(b, t, n, c)
        out = dense(c, True, "proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class NestRelAttention(nn.Module):
    """Block-local MHSA + Swin-style learned relative position bias over the
    block window (reference ``nest_rel.py:57-114``; bias table/index identical
    to Swin's, window = block grid). Head merge stays NesT's head-dim-major."""

    dim: int
    num_heads: int
    window: int  # block_size
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        from .swin import relative_position_index

        b, t, n, c = x.shape
        h = self.num_heads
        hd = c // h
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias,
                       kernel_init=trunc_normal_init(0.02),
                       dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, t, n, 3, h, hd)
        q, k, v = jnp.moveaxis(qkv, 3, 0)
        attn = jnp.einsum("btqhd,btkhd->bthqk", q, k) * (hd ** -0.5)
        table = self.param("relative_position_bias_table",
                           trunc_normal_init(0.02),
                           ((2 * self.window - 1) ** 2, h))
        idx = relative_position_index(self.window).reshape(-1)
        bias = table[idx].reshape(n, n, h).transpose(2, 0, 1)  # (h, n, n)
        attn = attn + bias[None, None].astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = jnp.einsum("bthqk,btkhd->btqdh", attn, v).reshape(b, t, n, c)
        out = nn.Dense(c, kernel_init=trunc_normal_init(0.02),
                       dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class NestTransformerLayer(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    attn_type: str = "standard"  # 'standard' | 'gpsa' | 'rel'
    block_size: int = 5  # for 'rel' bias window
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=name)
        dp = DropPath(self.drop_path, name="drop_path")
        if self.attn_type == "gpsa":
            attn = NestGPSA(self.dim, self.num_heads, self.qkv_bias,
                            self.attn_drop, self.drop, dtype=self.dtype,
                            name="attn")
        elif self.attn_type == "rel":
            attn = NestRelAttention(self.dim, self.num_heads, self.block_size,
                                    self.qkv_bias, self.attn_drop, self.drop,
                                    dtype=self.dtype, name="attn")
        else:
            attn = NestAttention(self.dim, self.num_heads, self.qkv_bias,
                                 self.attn_drop, self.drop, dtype=self.dtype,
                                 name="attn")
        y = attn(ln("norm1")(x), train)
        x = x + dp(y, deterministic=not train)
        h = ln("norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        drop = nn.Dropout(self.drop, deterministic=not train)
        h = drop(gelu(nn.Dense(hidden, kernel_init=trunc_normal_init(0.02),
                               dtype=self.dtype, name="mlp_fc1")(h)))
        h = drop(nn.Dense(self.dim, kernel_init=trunc_normal_init(0.02),
                          dtype=self.dtype, name="mlp_fc2")(h))
        return x + dp(h, deterministic=not train)


class ConvPool(nn.Module):
    """Block aggregation: 3x3 conv + channel LN + 3x3 maxpool (pad 1).

    ``stride=1`` is the reference ``ConvPool(downsample=False)`` branch
    (``nest_resembed_2x.py:205-208``): same aggregation, no spatial
    reduction."""

    dim: int
    stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = nn.Conv(self.dim, (3, 3), padding=1,
                    kernel_init=trunc_normal_init(0.02),
                    dtype=self.dtype, name="conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return nn.max_pool(x, (3, 3), strides=(self.stride, self.stride),
                           padding=((1, 1), (1, 1)))


# The resembed variant's active ConvBlock (the 7x7 definition at
# ``nest_resembed.py:63-100`` is dead code inside a string literal) is exactly
# the Visformer residual 3-conv stem — reuse it.
from .visformer import ConvStem as NestConvStem  # noqa: E402


class Nest(nn.Module):
    img_size: int = 80
    patch_size: int = 4
    embed_dims: Sequence[int] = (96, 192, 384)
    num_heads: Sequence[int] = (3, 6, 12)
    depths: Sequence[int] = (2, 3, 3)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.5
    conv_stem: bool = False  # resembed variant
    stem_hidden: int = 64
    gpsa_levels: int = 0  # levels < this use GPSA (nest_gpsa.py:375)
    rel_bias: bool = False  # all levels use relative-position bias (nest_rel)
    last_level_2x: bool = False  # resembed-2x: last level at 2x resolution
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return self.embed_dims[-1]

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        num_levels = len(self.embed_dims)
        num_blocks = [4 ** (num_levels - 1 - i) for i in range(num_levels)]
        grid = self.img_size // self.patch_size
        block_size = grid // int(math.sqrt(num_blocks[0]))

        if self.conv_stem:
            x = NestConvStem(self.stem_hidden, self.embed_dims[0],
                             dtype=self.dtype, name="patch_embed")(x, train)
        else:
            x = nn.Conv(self.embed_dims[0],
                        (self.patch_size, self.patch_size),
                        strides=self.patch_size, padding="VALID",
                        kernel_init=trunc_normal_init(0.02),
                        dtype=self.dtype, name="patch_embed")(x)

        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        first = 0
        for lvl in range(num_levels):
            dim = self.embed_dims[lvl]
            # resembed-2x (``nest_resembed_2x.py:378-382``): the last level
            # skips the spatial downsample and runs its single block at 2x
            # edge length (4x tokens). NB the reference ctor builds exactly
            # this geometry (block_size*2, seq_length*4 pos embed) but never
            # passes its own ``downsample=False`` flag, so its forward cannot
            # run at any image size — we implement the evident intent.
            hires = self.last_level_2x and lvl == num_levels - 1
            lb = block_size * 2 if hires else block_size
            if lvl > 0:
                x = ConvPool(dim, stride=1 if hires else 2, dtype=self.dtype,
                             name=f"levels_{lvl}_pool")(x, train)
            x = blockify(x, lb)
            pos = self.param(f"levels_{lvl}_pos_embed", trunc_normal_init(0.02),
                             (1, num_blocks[lvl], lb * lb, dim))
            x = nn.Dropout(self.drop_rate, deterministic=not train)(x + pos)
            attn_type = ("gpsa" if lvl < self.gpsa_levels
                         else "rel" if self.rel_bias else "standard")
            for j in range(self.depths[lvl]):
                x = NestTransformerLayer(
                    dim, self.num_heads[lvl], self.mlp_ratio, self.qkv_bias,
                    self.drop_rate, self.attn_drop_rate, dpr[first + j],
                    attn_type=attn_type, block_size=lb,
                    dtype=self.dtype, name=f"levels_{lvl}_layers_{j}",
                )(x, train)
            first += self.depths[lvl]
            x = deblockify(x, lb)

        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        pooled = jnp.mean(x, axis=(1, 2))
        pooled = nn.Dropout(self.drop_rate, deterministic=not train)(pooled)
        return x, pooled


@models.register("nest_nano_80")
def nest_nano_80(**kwargs: Any) -> Nest:
    return Nest(img_size=80, embed_dims=(96, 192, 384), num_heads=(3, 6, 12),
                depths=(2, 3, 3), **kwargs)


@models.register("nest_micro_80")
def nest_micro_80(**kwargs: Any) -> Nest:
    return Nest(img_size=80, embed_dims=(128, 384, 512), num_heads=(4, 12, 16),
                depths=(2, 2, 2), **kwargs)


@models.register("nest_micro_resembed_80")
def nest_micro_resembed_80(**kwargs: Any) -> Nest:
    return Nest(img_size=80, embed_dims=(128, 384, 512), num_heads=(4, 12, 16),
                depths=(2, 2, 2), conv_stem=True, **kwargs)


@models.register("nest_micro_resembed_2x_80")
def nest_micro_resembed_2x_80(**kwargs: Any) -> Nest:
    """resembed-2x: micro dims + residual conv stem + last level at 2x
    resolution (``nest_resembed_2x.py:374-383``). The reference registers this
    under the SAME name as nest_resembed ('nest_micro_resembed_80',
    ``nest_resembed_2x.py:574``) so it is clobbered/unreachable, and its
    forward is broken besides (the ctor never passes its own
    ``downsample=False``, verified by execution in tests/test_nest.py) —
    registered here under a distinct name, implementing the intent."""
    return Nest(img_size=80, embed_dims=(128, 384, 512), num_heads=(4, 12, 16),
                depths=(2, 2, 2), conv_stem=True, last_level_2x=True, **kwargs)


@models.register("nest_micro_v2_gpsa")
def nest_micro_v2_gpsa(**kwargs: Any) -> Nest:
    """v2 dims with GPSA in levels 0-1 (``meta_tuning_sun_m/nest_gpsa.py:
    531-536,573-577``; ``use_gpsa = i < 2`` at ``:375``)."""
    return Nest(img_size=80, embed_dims=(128, 384, 512), num_heads=(16, 24, 32),
                depths=(2, 2, 2), gpsa_levels=2, **kwargs)


@models.register("nest_micro_v2_rel_80")
def nest_micro_v2_rel_80(**kwargs: Any) -> Nest:
    """v2 dims with relative-position-bias attention in every level
    (``meta_tuning_sun_m/nest_rel.py:465-470,507-511``; window = block grid
    at ``:212``)."""
    return Nest(img_size=80, embed_dims=(128, 384, 512), num_heads=(16, 24, 32),
                depths=(2, 2, 2), rel_bias=True, **kwargs)


@models.register("nest_micro_resembed_ada_80")
def nest_micro_resembed_ada_80(**kwargs: Any) -> Nest:
    """Registered reference variant whose 'adapool' is commented out of its
    own forward (``meta_tuning_sun_m/nest_adapool.py:252-266`` — AdaptivePool
    constructed nowhere, applied nowhere), so the live model is exactly
    nest_micro_resembed (same ctor at ``:576-581,620-624``)."""
    return Nest(img_size=80, embed_dims=(128, 384, 512), num_heads=(4, 12, 16),
                depths=(2, 2, 2), conv_stem=True, **kwargs)


@models.register("nest_12m_v3")
def nest_12m_v3(**kwargs: Any) -> Nest:
    """Teacher-package variant (``sun_train_teacher/models/nest.py:455-466``)."""
    return Nest(img_size=80, embed_dims=(160, 480, 512), num_heads=(16, 24, 32),
                depths=(1, 1, 2), **kwargs)
