"""Swin Transformer — windowed attention with relative position bias.

Behavioral spec from ``sun_meta_training/models/swin_transformer.py`` (standard
Swin: window partition ``:88-115``, W-MSA with relative position bias
``:118-194``, shifted windows with a precomputed additive mask ``:243-266``,
PatchMerging ``:305-340``) and ``swin_3conv.py`` (patch embed replaced by the
Visformer residual conv stem that flattens to tokens, ``:92-129``; dense output
reshaped to a 5x5 map ``:563-574``).

TPU-first notes: window partition is a reshape/transpose over NHWC; the
relative-position index and the shifted-window mask are host-side numpy
constants baked into the program (static shapes). Dense output is returned as
an NHWC map (the reference's plain-swin copy returns the raw (B, L, C)
sequence; the 3conv copy reshapes to a map — we standardize on the map).

Registered: ``swin_nano_patch4_window5_80`` (img 96, patch 4, window 6, embed
64, depths (1,1,1,2), heads (2,4,8,16) — ``swin_transformer.py:610-617``) and
``swin_micro_resembed_80`` (img 80, 3-conv stem, window 5, embed 144, depths
(2,3,2), heads (4,8,16), drop_path 0.5 — ``swin_3conv.py:674-681``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import models
from .common import DropPath, gelu, trunc_normal_init
from .visformer import ConvStem


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def relative_position_index(ws: int) -> np.ndarray:
    """Static (ws*ws, ws*ws) index into the (2ws-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def shifted_window_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Static additive mask (nW, ws*ws, ws*ws) for SW-MSA (reference ``:243-263``)."""
    img = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    # window_partition is pure reshape/transpose, so run it host-side on the
    # numpy constant — no device round-trip per SwinBlock trace
    mw = window_partition(img, ws).reshape(-1, ws * ws)
    mask = mw[:, None, :] - mw[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[np.ndarray], train: bool,
                 grid: Optional[Tuple[int, int]] = None,
                 shift: int = 0) -> jax.Array:
        b_, n, c = x.shape
        h = self.num_heads
        hd = c // h
        ws = self.window_size
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias,
                       kernel_init=trunc_normal_init(0.02),
                       dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, h, hd)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd ** -0.5)

        table = self.param(
            "relative_position_bias_table", trunc_normal_init(0.02),
            ((2 * ws - 1) ** 2, h),
        )
        idx = relative_position_index(ws).reshape(-1)
        bias = table[idx].reshape(n, n, h).transpose(2, 0, 1)  # (h, n, n)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, h, n, n) + jnp.asarray(
                mask, attn.dtype)[None, :, None]
            attn = attn.reshape(b_, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        # real attention capture (see visformer.Attention): no-op unless the
        # caller makes the "intermediates" collection mutable
        self.sow("intermediates", "attn", attn)
        if grid is not None:
            # visualization-ready map: the raw sow's leading axis is B*nW
            # (window-partitioned), which a consumer cannot stitch or
            # unshift without this block's geometry — so also sow the
            # head+query-averaged map on the image plane, windows reversed
            # and the cyclic shift undone.
            h, w = grid
            amap = window_reverse(attn.mean(axis=(1, 2))[..., None], ws, h, w)
            if shift > 0:
                amap = jnp.roll(amap, (shift, shift), axis=(1, 2))
            self.sow("intermediates", "attn_map", amap[..., 0])
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b_, n, c)
        out = nn.Dense(c, kernel_init=trunc_normal_init(0.02),
                       dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class SwinBlock(nn.Module):
    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        h, w = self.input_resolution
        ws, shift = self.window_size, self.shift_size
        if min(h, w) <= ws:
            ws, shift = min(h, w), 0  # window larger than input: no partition
        b, l, c = x.shape
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        dp = DropPath(self.drop_path, name="drop_path")

        shortcut = x
        y = ln("norm1")(x).reshape(b, h, w, c)
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        windows = window_partition(y, ws)
        mask = shifted_window_mask(h, w, ws, shift) if shift > 0 else None
        attn = WindowAttention(
            self.dim, ws, self.num_heads, self.qkv_bias,
            self.attn_drop, self.drop, dtype=self.dtype, name="attn",
        )(windows, mask, train, grid=(h, w), shift=shift)
        y = window_reverse(attn, ws, h, w)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = shortcut + dp(y.reshape(b, l, c), deterministic=not train)

        y = ln("norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        drop = nn.Dropout(self.drop, deterministic=not train)
        y = drop(gelu(nn.Dense(hidden, kernel_init=trunc_normal_init(0.02),
                               dtype=self.dtype, name="mlp_fc1")(y)))
        y = drop(nn.Dense(self.dim, kernel_init=trunc_normal_init(0.02),
                          dtype=self.dtype, name="mlp_fc2")(y))
        return x + dp(y, deterministic=not train)


class PatchMerging(nn.Module):
    dim: int
    input_resolution: Tuple[int, int]
    smooth: bool = False  # 'adapool' variant: 3x3 avg smoothing before merge
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h, w = self.input_resolution
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        if self.smooth:
            # the reference's live AdaptivePool path is a plain AvgPool2d(3,1,1)
            # (swin_3conv_adapool.py:347-357 — the learned max-mix is commented
            # out, its gating weight left an unused parameter)
            x = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        ).reshape(b, (h // 2) * (w // 2), 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False,
                        kernel_init=trunc_normal_init(0.02),
                        dtype=self.dtype, name="reduction")(x)


class SwinTransformer(nn.Module):
    img_size: int = 96
    patch_size: int = 4
    embed_dim: int = 64
    depths: Sequence[int] = (1, 1, 1, 2)
    num_heads: Sequence[int] = (2, 4, 8, 16)
    window_size: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    ape: bool = False
    patch_norm: bool = True
    conv_stem: bool = False  # 3conv (resembed) variant
    stem_hidden: int = 64
    merge_smooth: bool = False  # 'adapool' variant
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        b = x.shape[0]
        if self.conv_stem:
            x = ConvStem(self.stem_hidden, self.embed_dim,
                         dtype=self.dtype, name="patch_embed")(x, train)
            grid = x.shape[1]
            x = x.reshape(b, grid * grid, self.embed_dim)
        else:
            grid = self.img_size // self.patch_size
            x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                        strides=self.patch_size, padding="VALID",
                        kernel_init=trunc_normal_init(0.02),
                        dtype=self.dtype, name="patch_embed_proj")(x)
            x = x.reshape(b, grid * grid, self.embed_dim)
            if self.patch_norm:
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name="patch_embed_norm")(x)
        if self.ape:
            pos = self.param("absolute_pos_embed", trunc_normal_init(0.02),
                             (1, grid * grid, self.embed_dim))
            x = x + pos
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)

        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        first = 0
        res = grid
        for i, depth in enumerate(self.depths):
            dim = int(self.embed_dim * 2 ** i)
            for j in range(depth):
                x = SwinBlock(
                    dim, (res, res), self.num_heads[i], self.window_size,
                    0 if j % 2 == 0 else self.window_size // 2,
                    self.mlp_ratio, self.qkv_bias, self.drop_rate,
                    self.attn_drop_rate, dpr[first + j], dtype=self.dtype,
                    name=f"layers_{i}_blocks_{j}",
                )(x, train)
            first += depth
            if i < len(self.depths) - 1:
                x = PatchMerging(dim, (res, res), smooth=self.merge_smooth,
                                 dtype=self.dtype,
                                 name=f"layers_{i}_downsample")(x)
                res //= 2

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        pooled = jnp.mean(x, axis=1)
        return x.reshape(b, res, res, -1), pooled


@models.register("swin_nano_patch4_window5_80")
def swin_nano_patch4_window5_80(**kwargs: Any) -> SwinTransformer:
    return SwinTransformer(
        img_size=96, patch_size=4, window_size=6, embed_dim=64,
        depths=(1, 1, 1, 2), num_heads=(2, 4, 8, 16), **kwargs,
    )


@models.register("swin_micro_resembed_80")
def swin_micro_resembed_80(drop_path_rate: float = 0.5, **kwargs: Any) -> SwinTransformer:
    return SwinTransformer(
        img_size=80, patch_size=4, window_size=5, embed_dim=144,
        depths=(2, 3, 2), num_heads=(4, 8, 16),
        drop_path_rate=drop_path_rate, conv_stem=True, **kwargs,
    )


@models.register("swin_micro_v2_resembed_ada_80")
def swin_micro_v2_resembed_ada_80(drop_path_rate: float = 0.5, **kwargs: Any) -> SwinTransformer:
    """3conv stem + avg-smoothing before each PatchMerging (reference
    ``meta_tuning_sun_m/swin_3conv_adapool.py:683-689``; live adapool behavior
    at ``:347-357,371,385``)."""
    return SwinTransformer(
        img_size=80, patch_size=4, window_size=5, embed_dim=144,
        depths=(2, 3, 2), num_heads=(4, 8, 16),
        drop_path_rate=drop_path_rate, conv_stem=True, merge_smooth=True,
        **kwargs,
    )
