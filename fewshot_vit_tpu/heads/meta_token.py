"""Meta-token episodic heads (support-token <-> query-patch cross-attention).

Re-design of the reference's experimental ``sun_meta_training/models/meta_token.py``
(``meta-token`` :164-218, ``meta-token-v2`` :270-322, ``meta-token-v3`` :324-381,
with ``TokenQKV`` :10-61, ``TokenQKV_Local`` :115-162, ``Sampling`` :223-246,
``SamplingKeepToken`` :248-268). Unreferenced by any reference config, but —
unlike the broken ``token-label-ep-rw``/``-v2`` modules — fully runnable
research code with its own shape test (``models/check.py:83-91``), so it is
ported and parity-tested rather than waived.

Episode layout: x_shot (E, way, shot, H, W, 3), x_query (E, way, query, H, W, 3)
(the reference math requires the 3-dim query shape: ``feat_query`` must reshape
to (b, n, q, hw, c)). Returns ``(logits, cls_logits)``:

* ``logits`` — per-(query, support-item) token-attention similarities,
  (E, way*query, way*shot); consumed with ``compute_acc_kshots``;
* ``cls_logits`` — pooled cosine-prototype logits, (E, way*query, way).

The reference modules also construct an ``nn.Linear`` classifier that their
forward never touches; that dead parameter is not reproduced.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import models
from ..ops.metric import (
    compute_logits,
    compute_logits_kshot,
    compute_logits_local_kshot,
    l2_normalize,
)


def token_qkv(feat_query: jax.Array, x_support: jax.Array,
              num_heads: int) -> tuple[jax.Array, jax.Array]:
    """Parameter-free support-token -> query-patch attention
    (reference ``TokenQKV.forward``, ``meta_token.py:37-61`` — every q/k/v
    projection is commented out there, so the op is pure).

    feat_query (b, n, q, hw, c), x_support (b, n, k, c) ->
    o_query (b, n*q, n*k, c), o_support (b, 1, n*k, c).
    """
    b, n, k, c = x_support.shape
    q, hw = feat_query.shape[2], feat_query.shape[3]
    h = num_heads
    cs = c // h
    scale = cs ** -0.5

    support_flat = x_support.reshape(b, n * k, c)
    # q: (b, h, n*k, cs); k/v: (b, n*q, h, hw, cs)
    qs = support_flat.reshape(b, n * k, h, cs).transpose(0, 2, 1, 3)
    kq = feat_query.reshape(b, n * q, hw, h, cs).transpose(0, 1, 3, 2, 4)
    attn = jnp.einsum("bhmc,bqhtc->bqhmt", qs, kq) * scale
    attn = jax.nn.softmax(attn, axis=-1)
    o_query = jnp.einsum("bqhmt,bqhtc->bqhmc", attn, kq)
    o_query = o_query.transpose(0, 1, 3, 2, 4).reshape(b, n * q, n * k, c)
    return o_query, support_flat[:, None]


def _attend_select(token: jax.Array, feature: jax.Array, rate: float):
    """Shared patch selection of ``Sampling``/``SamplingKeepToken``
    (reference ``meta_token.py:228-246`` / ``:252-268``): attention of the
    pooled token over its patches, keep the top-``rate`` fraction, renormalize
    their weights.

    token (b, n, k, c), feature (b, n, k, hw, c) ->
    sel_attn (b, n*k, kk), sel_feat (b, n*k, kk, c)."""
    b, n, k, c = token.shape
    hw = feature.shape[3]
    kk = int(hw * rate)
    if kk < 1:
        raise ValueError(
            f"sampling rate {rate} keeps int({hw}*{rate})=0 patches; the "
            "renormalization would divide by zero"
        )
    t = token.reshape(b, n * k, 1, c)
    f = feature.reshape(b, n * k, hw, c)
    attn = jnp.einsum("bmxc,bmtc->bmxt", t, f) * (c ** -0.5)
    attn = jax.nn.softmax(attn, axis=-1)[:, :, 0]            # (b, nk, hw)
    sel_attn, sel_idx = jax.lax.top_k(attn, kk)              # (b, nk, kk)
    sel_attn = sel_attn / jnp.sum(sel_attn, axis=-1, keepdims=True)
    sel_feat = jnp.take_along_axis(f, sel_idx[..., None], axis=2)
    return sel_attn, sel_feat


def sampling_pool(token: jax.Array, feature: jax.Array,
                  rate: float = 0.5) -> jax.Array:
    """Attention-select the top-``rate`` patches and average them into a new
    token (reference ``Sampling.forward``, ``meta_token.py:228-246``).

    token (b, n, k, c), feature (b, n, k, hw, c) -> (b, n, k, c)."""
    b, n, k, c = token.shape
    sel_attn, sel_feat = _attend_select(token, feature, rate)
    out = jnp.einsum("bmt,bmtc->bmc", sel_attn, sel_feat)
    return out.reshape(b, n, k, c)


def sampling_keep(token: jax.Array, feature: jax.Array,
                  rate: float = 0.5) -> jax.Array:
    """Same selection, but keep the (weighted) selected patches
    (reference ``SamplingKeepToken.forward``, ``meta_token.py:252-268``).

    token (b, n, k, c), feature (b, n, k, hw, c) -> (b, n, k, hw*rate, c)."""
    b, n, k, c = token.shape
    sel_attn, sel_feat = _attend_select(token, feature, rate)
    kk = sel_attn.shape[-1]
    return (sel_attn[..., None] * sel_feat).reshape(b, n, k, kk, c)


class TokenQKVLocal(nn.Module):
    """Projected local-token cross-attention (reference ``TokenQKV_Local``,
    ``meta_token.py:115-162``): q from support patches, k/v from query patches.

    x_query (b, n, q, hw, c), x_support (b, n, k, hw, c) ->
    o_query (b, n*q, n*k, hw, c), o_support (b, n*q, n*k, hw, c)."""

    num_heads: int = 1
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_query: jax.Array, x_support: jax.Array):
        b, n, k, hw_s, c = x_support.shape
        q, hw = x_query.shape[2], x_query.shape[3]
        h = self.num_heads
        cs = c // h
        scale = cs ** -0.5

        dense = dict(use_bias=self.qkv_bias, dtype=self.dtype)
        q_lin = nn.Dense(c, **dense, name="q")
        k_lin = nn.Dense(c, **dense, name="k")
        v_lin = nn.Dense(c, **dense, name="v")

        sup = x_support.reshape(b, n, k * hw_s, c)
        qs = q_lin(sup).reshape(b, n * k * hw_s, h, cs).transpose(0, 2, 1, 3)
        kq = k_lin(x_query).reshape(b, n * q, hw, h, cs).transpose(0, 1, 3, 2, 4)
        vq = v_lin(x_query).reshape(b, n * q, hw, h, cs).transpose(0, 1, 3, 2, 4)
        attn = jnp.einsum("bhmc,bqhtc->bqhmt", qs, kq) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        o_query = jnp.einsum("bqhmt,bqhtc->bqhmc", attn, vq)
        o_query = (o_query.transpose(0, 1, 3, 2, 4)
                   .reshape(b, n * q, n * k, hw_s, c))
        o_support = jnp.broadcast_to(
            v_lin(sup).reshape(b, 1, n * k, hw_s, c),
            (b, n * q, n * k, hw_s, c))
        return o_query, o_support


class _MetaTokenBase(nn.Module):
    encoder: nn.Module
    num_heads: int = 1
    method: str = "cos"
    temp: float = 10.0
    temp_learnable: bool = True

    # Grouped (E, way, query, ...) query layout + tuple return: NOT the
    # standard (x_shot, x_query) -> (E, Q, way) episodic contract the
    # meta-tune/eval loops drive (see train/meta_tune.py's check).
    standard_episodic = False

    def __post_init__(self):
        super().__post_init__()
        if self.method != "cos":
            # The reference only implements cosine here too: its
            # compute_logits_kshot has no metric branch, and metric='sqr'
            # dies in compute_logits_local (utils/__init__.py:103-112).
            raise ValueError(
                f"meta-token heads implement method='cos' only, got "
                f"{self.method!r}"
            )

    def _encode(self, x_shot, x_query, train):
        e, way, shot = x_shot.shape[:3]
        q = x_query.shape[2]
        img = x_shot.shape[3:]
        dense_s, pooled_s = self.encoder(x_shot.reshape((-1,) + img), train)
        dense_q, pooled_q = self.encoder(x_query.reshape((-1,) + img), train)
        c = pooled_s.shape[-1]
        # NHWC dense maps flatten row-major over (h, w) — the same token order
        # as the reference's NCHW view(b, c, hw).transpose(-1, -2)
        feat_shot = dense_s.reshape(e, way, shot, -1, c)
        feat_query = dense_q.reshape(e, way, q, -1, c)
        x_s = pooled_s.reshape(e, way, shot, c)
        x_q = pooled_q.reshape(e, way, q, c)
        return feat_shot, feat_query, x_s, x_q

    def _temp(self):
        if self.temp_learnable:
            return self.param("temp", lambda k: jnp.array(self.temp, jnp.float32))
        return self.temp

    @staticmethod
    def _cls_logits(x_shot, x_query, temp):
        """Pooled cosine-prototype logits (reference ``meta_token.py:211-217``):
        shot-mean, normalize both, dot at temp."""
        e, way, q = x_query.shape[:3]
        proto = l2_normalize(x_shot.mean(axis=-2))       # (E, way, C)
        feat = l2_normalize(x_query.reshape(e, way * q, -1))
        return compute_logits(feat, proto, "dot", temp)


class MetaToken(_MetaTokenBase):
    """Reference ``meta-token`` (``meta_token.py:164-218``): parameter-free
    TokenQKV between pooled support tokens and query patch maps."""

    @nn.compact
    def __call__(self, x_shot, x_query, train: bool = False):
        _, feat_query, x_s, x_q = self._encode(x_shot, x_query, train)
        temp = self._temp()
        o_query, o_support = token_qkv(feat_query, x_s, self.num_heads)
        logits = compute_logits_kshot(o_query, o_support, temp)
        return logits, self._cls_logits(x_s, x_q, temp)


class MetaTokenV2(_MetaTokenBase):
    """Reference ``meta-token-v2`` (``meta_token.py:270-322``): support tokens
    are first re-pooled from their top-50% salient patches (``Sampling``)."""

    @nn.compact
    def __call__(self, x_shot, x_query, train: bool = False):
        feat_shot, feat_query, x_s, x_q = self._encode(x_shot, x_query, train)
        temp = self._temp()
        x_s = sampling_pool(x_s, feat_shot)
        o_query, o_support = token_qkv(feat_query, x_s, self.num_heads)
        logits = compute_logits_kshot(o_query, o_support, temp)
        # the reference's cls path reuses the SAMPLED support tokens (:312)
        return logits, self._cls_logits(x_s, x_q, temp)


class MetaTokenV3(_MetaTokenBase):
    """Reference ``meta-token-v3`` (``meta_token.py:324-381``): both sides keep
    their top-50% patches (``SamplingKeepToken``), matched by the projected
    local cross-attention (``TokenQKV_Local``) and mean local cosine."""

    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_shot, x_query, train: bool = False):
        feat_shot, feat_query, x_s, x_q = self._encode(x_shot, x_query, train)
        temp = self._temp()
        sel_shot = sampling_keep(x_s, feat_shot)
        sel_query = sampling_keep(x_q, feat_query)
        o_query, o_support = TokenQKVLocal(
            num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            dtype=self.dtype, name="transformer",
        )(sel_query, sel_shot)
        logits = compute_logits_local_kshot(o_query, o_support, temp)
        # cls path uses the ORIGINAL pooled tokens (:372), not the sampled ones
        return logits, self._cls_logits(x_s, x_q, temp)


def _make(cls, encoder, encoder_args, enc_dtype, **kw):
    enc = models.make(encoder, dtype=enc_dtype, **(encoder_args or {}))
    return cls(encoder=enc, **kw)


@models.register("meta-token")
def make_meta_token(encoder: str, encoder_args: Optional[dict] = None,
                    num_heads: int = 1, method: str = "cos", temp: float = 10.0,
                    temp_learnable: bool = True, dtype: Any = jnp.float32,
                    **_: Any) -> MetaToken:
    return _make(MetaToken, encoder, encoder_args, dtype, num_heads=num_heads,
                 method=method, temp=temp, temp_learnable=temp_learnable)


@models.register("meta-token-v2")
def make_meta_token_v2(encoder: str, encoder_args: Optional[dict] = None,
                       num_heads: int = 1, method: str = "cos",
                       temp: float = 10.0, temp_learnable: bool = True,
                       dtype: Any = jnp.float32, **_: Any) -> MetaTokenV2:
    return _make(MetaTokenV2, encoder, encoder_args, dtype, num_heads=num_heads,
                 method=method, temp=temp, temp_learnable=temp_learnable)


@models.register("meta-token-v3")
def make_meta_token_v3(encoder: str, encoder_args: Optional[dict] = None,
                       num_heads: int = 1, qkv_bias: bool = True,
                       method: str = "cos", temp: float = 10.0,
                       temp_learnable: bool = True, dtype: Any = jnp.float32,
                       **_: Any) -> MetaTokenV3:
    return _make(MetaTokenV3, encoder, encoder_args, dtype, num_heads=num_heads,
                 qkv_bias=qkv_bias, method=method, temp=temp,
                 temp_learnable=temp_learnable, dtype=dtype)
