"""Pallas TPU kernel: fused multi-head self-attention for short token axes.

The zoo's attention ops run over tiny token counts (Visformer: 100/25 tokens;
NesT blocks: 25; Swin windows: 25-36) where the whole (T, T) score matrix fits
VMEM many times over. This kernel fuses qk^T -> (+bias) -> softmax -> @v into
one program per (batch, head), eliminating the intermediate HBM round trips of
the unfused XLA chain.

Used by encoders via ``attention_core`` — a drop-in for the einsum triple in
``models.visformer.Attention`` etc. Falls back to pure XLA when shapes are
unfavourable (token axis too long for a single block).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mhsa_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (T, hd)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (T, T)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_mhsa(
    q: jax.Array, k: jax.Array, v: jax.Array,
    scale: float, interpret: bool = False,
) -> jax.Array:
    """q, k, v (B, H, T, hd) -> (B, H, T, hd); full softmax(q k^T * scale) v.

    One grid step per (batch, head); the (T, T) score matrix lives only in
    VMEM/registers.
    """
    b, h, t, hd = q.shape
    grid = (b * h,)
    spec = pl.BlockSpec((1, t, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_mhsa_kernel, scale=scale),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, t, hd), q.dtype),
        interpret=interpret,
    )(q.reshape(b * h, t, hd), k.reshape(b * h, t, hd), v.reshape(b * h, t, hd))
    return out.reshape(b, h, t, hd)


def attention_core(
    q: jax.Array, k: jax.Array, v: jax.Array,
    scale: float, use_pallas: bool = True, max_tokens: int = 512,
) -> jax.Array:
    """(B, T, H, hd) qkv -> (B, T, H, hd) attention output.

    Pallas-fused when the token axis is short enough to hold (T, T) scores in
    one block; XLA einsum chain otherwise."""
    b, t, h, hd = q.shape
    if use_pallas and t <= max_tokens and jax.devices()[0].platform != "cpu":
        qt = q.transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        return fused_mhsa(qt, kt, vt, scale).transpose(0, 2, 1, 3)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)
