"""LeViT — conv-stem attention net with BN-fused linears and attention-bias
positional encoding.

Behavioral spec from ``sun_meta_training/models/levit.py`` (note ``levit_384``
is *redefined* there as embed (256,384,512), key_dim 32, heads (4,6,8), depth
(1,2,3) — ``:56-57`` — and ``levit_micro_80`` is that config at 80px with the
Visformer residual conv stem as patch embed, ``:146-148, :484``):

  * LinearNorm = bias-free Linear + BatchNorm1d over flattened tokens
    (``:174-196``); second MLP/proj norms init scale 0;
  * Attention: qkv -> per-head split (key_dim, key_dim, d=attn_ratio*key_dim),
    additive learned attention biases indexed by a static offset table
    (``:262-336``); hard-swish activations;
  * AttentionSubsample between stages: queries from stride-2 subsampled tokens,
    keys/values at full resolution (``:339-430``) — resolution 20 -> 10 -> 5;
  * per-sample residual drop (``Residual``, ``:237-248``);
  * ``forward -> (dense_map, mean-pooled)`` (``:551-566``).
"""

from __future__ import annotations

import itertools
from typing import Any, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import models
from .common import bn_use_running_average, DropPath
from .visformer import ConvStem


def hard_swish(x: jax.Array) -> jax.Array:
    return jax.nn.hard_swish(x)


class LinearNorm(nn.Module):
    """Bias-free Dense + BatchNorm over the token-flattened batch.

    ``fold_bn=True`` is the reference's own ``LinearNorm.fuse``
    (``levit.py:174-196``): the frozen-stats BN pre-folded into a biased
    Dense (weights transformed by ``models/fold.py::fold_levit``)."""

    features: int
    bn_weight_init: float = 1.0
    fold_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = nn.Dense(self.features, use_bias=self.fold_bn, dtype=self.dtype,
                     name="c")(x)
        if self.fold_bn:
            return x
        return nn.BatchNorm(
            use_running_average=bn_use_running_average(train), momentum=0.9, epsilon=1e-5,
            scale_init=nn.initializers.constant(self.bn_weight_init),
            dtype=self.dtype, name="bn",
        )(x)


def _attention_bias_idxs(res_q: int, res_kv: int, stride: int = 1) -> Tuple[np.ndarray, int]:
    """Static (Nq, Nkv) index matrix into the offset table (reference
    ``levit.py:289-302`` / ``:371-388``)."""
    points_kv = list(itertools.product(range(res_kv), range(res_kv)))
    points_q = list(itertools.product(range(res_q), range(res_q)))
    offsets: dict = {}
    idxs = []
    for p1 in points_q:
        for p2 in points_kv:
            off = (abs(p1[0] * stride - p2[0]), abs(p1[1] * stride - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    return np.asarray(idxs, np.int32).reshape(len(points_q), len(points_kv)), len(offsets)


class LevitAttention(nn.Module):
    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: int
    resolution: int
    fold_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        b, n, _ = x.shape
        kd, h = self.key_dim, self.num_heads
        d = self.attn_ratio * kd
        qkv = LinearNorm(h * (2 * kd + d), fold_bn=self.fold_bn,
                         dtype=self.dtype, name="qkv")(x, train)
        qkv = qkv.reshape(b, n, h, 2 * kd + d)
        q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)

        idxs, n_off = _attention_bias_idxs(self.resolution, self.resolution)
        biases = self.param("attention_biases", nn.initializers.zeros, (h, n_off))
        bias = biases[:, idxs]  # (h, N, N)

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (kd ** -0.5)
        attn = jax.nn.softmax(attn + bias[None].astype(attn.dtype), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, h * d)
        out = hard_swish(out)
        return LinearNorm(self.dim, bn_weight_init=0.0, fold_bn=self.fold_bn,
                          dtype=self.dtype, name="proj")(out, train)


class LevitAttentionSubsample(nn.Module):
    out_dim: int
    key_dim: int
    num_heads: int
    attn_ratio: int
    resolution: int  # input resolution
    stride: int = 2
    fold_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        b, n, c = x.shape
        kd, h = self.key_dim, self.num_heads
        d = self.attn_ratio * kd
        res = self.resolution
        res_ = (res - 1) // self.stride + 1

        kv = LinearNorm(h * (kd + d), fold_bn=self.fold_bn, dtype=self.dtype,
                        name="kv")(x, train)
        kv = kv.reshape(b, n, h, kd + d)
        k, v = jnp.split(kv, [kd], axis=-1)

        xq = x.reshape(b, res, res, c)[:, :: self.stride, :: self.stride]
        xq = xq.reshape(b, res_ * res_, c)
        q = LinearNorm(h * kd, fold_bn=self.fold_bn, dtype=self.dtype,
                       name="q")(xq, train)
        q = q.reshape(b, res_ * res_, h, kd)

        idxs, n_off = _attention_bias_idxs(res_, res, self.stride)
        biases = self.param("attention_biases", nn.initializers.zeros, (h, n_off))
        bias = biases[:, idxs]  # (h, N_, N)

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (kd ** -0.5)
        attn = jax.nn.softmax(attn + bias[None].astype(attn.dtype), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, res_ * res_, h * d)
        out = hard_swish(out)
        return LinearNorm(self.out_dim, fold_bn=self.fold_bn,
                          dtype=self.dtype, name="proj")(out, train)


class LevitMlp(nn.Module):
    dim: int
    hidden: int
    fold_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = LinearNorm(self.hidden, fold_bn=self.fold_bn, dtype=self.dtype,
                       name="fc1")(x, train)
        x = hard_swish(x)
        return LinearNorm(self.dim, bn_weight_init=0.0, fold_bn=self.fold_bn,
                          dtype=self.dtype, name="fc2")(x, train)


class Levit(nn.Module):
    img_size: int = 80
    patch_size: int = 4
    embed_dim: Sequence[int] = (256, 384, 512)
    key_dim: int = 32
    depth: Sequence[int] = (1, 2, 3)
    num_heads: Sequence[int] = (4, 6, 8)
    attn_ratio: int = 2
    mlp_ratio: int = 2
    stem_hidden: int = 64
    drop_path_rate: float = 0.0
    fold_bn: bool = False  # frozen-stats BNs pre-folded (models/fold.py)
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return self.embed_dim[-1]

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        b = x.shape[0]
        x = ConvStem(self.stem_hidden, self.embed_dim[0], fold_bn=self.fold_bn,
                     dtype=self.dtype, name="patch_embed")(x, train)
        # token grid from the ACTUAL stem output (its reduction is /4); a
        # patch_size-derived value would silently disagree for patch_size != 4
        res = x.shape[1]
        x = x.reshape(b, res * res, self.embed_dim[0])

        dp = DropPath(self.drop_path_rate, name="drop_path")
        idx = 0
        n_stages = len(self.embed_dim)
        for i in range(n_stages):
            ed = self.embed_dim[i]
            for _ in range(self.depth[i]):
                y = LevitAttention(
                    ed, self.key_dim, self.num_heads[i], self.attn_ratio,
                    res, fold_bn=self.fold_bn, dtype=self.dtype,
                    name=f"blocks_{idx}",
                )(x, train)
                x = x + dp(y, deterministic=not train)
                idx += 1
                y = LevitMlp(ed, ed * self.mlp_ratio, fold_bn=self.fold_bn,
                             dtype=self.dtype, name=f"blocks_{idx}")(x, train)
                x = x + dp(y, deterministic=not train)
                idx += 1
            if i < n_stages - 1:
                # down_ops: key_dim 32(ish), heads = embed_dim[i] // key_dim,
                # attn_ratio 4, mlp_ratio 2, stride 2 (reference :474-479)
                x = LevitAttentionSubsample(
                    self.embed_dim[i + 1], self.key_dim,
                    ed // self.key_dim, 4, res, 2, fold_bn=self.fold_bn,
                    dtype=self.dtype, name=f"blocks_{idx}_sub",
                )(x, train)
                idx += 1
                res = (res - 1) // 2 + 1
                y = LevitMlp(self.embed_dim[i + 1], self.embed_dim[i + 1] * 2,
                             fold_bn=self.fold_bn, dtype=self.dtype,
                             name=f"blocks_{idx}")(x, train)
                x = x + dp(y, deterministic=not train)
                idx += 1

        feat = x.reshape(b, res, res, self.embed_dim[-1])
        return feat, jnp.mean(x, axis=1)


@models.register("levit_micro_80")
def levit_micro_80(**kwargs: Any) -> Levit:
    """Reference ``levit_384`` redefinition @80px (``levit.py:56-57,146-148``)."""
    return Levit(
        img_size=80, embed_dim=(256, 384, 512), key_dim=32, depth=(1, 2, 3),
        num_heads=(4, 6, 8), **kwargs,
    )
