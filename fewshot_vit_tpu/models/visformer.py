"""Visformer — the reference's primary backbone, rebuilt TPU-native in flax.

Behavioral spec from ``/root/reference/sun_meta_training/models/visformer.py``:
  * residual 3-conv stem with LeakyReLU(0.1) + maxpool (``:204-241``);
  * three stages at strides /4, /8, /16 with per-stage learned 2-D positional
    embeddings (``:342-379``); stage dims (D/2, D, 2D);
  * stage-1 blocks are conv-MLP only (``attn_stage='011'``, ``spatial_conv='100'``):
    1x1 expand -> GELU -> 3x3 grouped conv -> GELU -> 1x1 project (``:127-163``);
  * stage-2/3 blocks are pre-BN attention + 1x1-conv MLP; attention uses a 1x1
    qkv projection over channels with head_dim = round(dim//heads * ratio)
    (``:166-196`` — note head_dim*heads != dim: 252 vs 256, 510 vs 512);
  * BatchNorm everywhere (eps 1e-5), stochastic depth linspace(0, p, depth);
  * forward returns ``(dense_map, global_avg_pool)`` (``:426-464``).

TPU-first design choices (not a translation):
  * NHWC layout so XLA tiles convs onto the MXU without transposes;
  * all 1x1 convs are ``nn.Dense`` over the channel axis (identical math, and
    XLA fuses them with the surrounding elementwise ops);
  * attention is a single batched einsum program over the flattened token axis —
    no per-head Python loops;
  * parameters stay fp32 while activations can run bfloat16 via ``dtype``.

Registered: ``visformer_micro_80`` (init 64, embed 256, depth (4,2,3), heads 6 —
reference ``:484-489``), plus ``visformer_tiny_80``, ``visformer_small``/``_80``,
``net5_80`` (``:467-499``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import models
from .common import (
    BatchNorm,
    DropPath,
    bn_use_running_average,
    gelu,
    global_avg_pool,
    kaiming_out_init,
    leaky_relu,
    trunc_normal_init,
)


class ConvStem(nn.Module):
    """Residual 3-conv stem (reference ``ConvBlock``, ``visformer.py:204-241``).

    conv3x3/s2 -> BN -> lrelu -> conv3x3 -> BN -> lrelu -> conv3x3 -> BN,
    plus a conv3x3/s2+BN shortcut, lrelu, then 2x2 maxpool. 80x80x3 -> 20x20xC.
    """

    hidden: int
    out: int
    fold_bn: bool = False  # frozen-stats BNs pre-folded into the conv weights
    quant_int8: Any = False  # False | True (dynamic act) | "static" (models/quant.py)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.quant_int8:
            from .quant import QuantConv

            conv = lambda f, s, name: QuantConv(
                f, (3, 3), strides=(s, s), padding=1, use_bias=self.fold_bn,
                static_act=self.quant_int8 == "static",
                dtype=self.dtype, name=name,
            )
        else:
            conv = lambda f, s, name: nn.Conv(
                f, (3, 3), strides=s, padding=1, use_bias=self.fold_bn,
                kernel_init=kaiming_out_init, dtype=self.dtype, name=name,
            )
        if self.fold_bn:
            bn = lambda name: (lambda y: y)
        else:
            bn = lambda name: nn.BatchNorm(
                use_running_average=bn_use_running_average(train), momentum=0.9,
                epsilon=1e-5, dtype=self.dtype, name=name,
            )
        out = conv(self.hidden, 2, "conv1")(x)
        out = leaky_relu(bn("bn1")(out))
        out = conv(self.out, 1, "conv2")(out)
        out = leaky_relu(bn("bn2")(out))
        out = conv(self.out, 1, "conv3")(out)
        out = bn("bn3")(out)
        identity = bn("downsample_bn")(conv(self.out, 2, "downsample_conv")(x))
        out = leaky_relu(out + identity)
        return nn.max_pool(out, (2, 2), strides=(2, 2))


class Mlp(nn.Module):
    """1x1 -> (optional grouped 3x3) -> 1x1 conv MLP (reference ``:127-163``)."""

    dim: int
    mlp_ratio: float = 4.0
    group: int = 8
    spatial_conv: bool = False
    drop: float = 0.0
    first_bias: bool = False  # set when the preceding BN is folded into conv1
    quant_int8: Any = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.spatial_conv:
            hidden = self.dim * 5 // 6 if self.group < 2 else self.dim * 2
        else:
            hidden = int(self.dim * self.mlp_ratio)
        if self.quant_int8:
            from .quant import QuantConv, QuantDense

            static = self.quant_int8 == "static"
            dense = lambda f, name, bias=False: QuantDense(
                f, use_bias=bias, static_act=static, dtype=self.dtype,
                name=name)
            conv2 = lambda: QuantConv(
                hidden, (3, 3), padding=1, feature_group_count=self.group,
                static_act=static, dtype=self.dtype, name="conv2")
        else:
            dense = lambda f, name, bias=False: nn.Dense(
                f, use_bias=bias, kernel_init=kaiming_out_init,
                dtype=self.dtype, name=name,
            )
            conv2 = lambda: nn.Conv(
                hidden, (3, 3), padding=1, feature_group_count=self.group,
                use_bias=False, kernel_init=kaiming_out_init,
                dtype=self.dtype, name="conv2",
            )
        drop = nn.Dropout(self.drop, deterministic=not train)
        x = gelu(dense(hidden, "conv1", self.first_bias)(x))
        x = drop(x)
        if self.spatial_conv:
            x = gelu(conv2()(x))
        x = dense(self.dim, "conv3")(x)
        return drop(x)


class Attention(nn.Module):
    """MHSA over the flattened HxW token axis (reference ``:166-196``).

    head_dim = round(dim//heads * head_dim_ratio); qkv and output projections
    are channel-wise (1x1-conv-equivalent) Dense layers.
    """

    dim: int
    num_heads: int
    head_dim_ratio: float = 1.0
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_pallas: bool = False  # fused kernel for long token axes (see kernels/)
    quant_int8: Any = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        b, h, w, _ = x.shape
        heads = self.num_heads
        head_dim = round(self.dim // heads * self.head_dim_ratio)
        scale = head_dim ** -0.5

        if self.quant_int8:
            from .quant import QuantDense

            dense = lambda f, bias, name: QuantDense(
                f, use_bias=bias, static_act=self.quant_int8 == "static",
                dtype=self.dtype, name=name)
        else:
            dense = lambda f, bias, name: nn.Dense(
                f, use_bias=bias, kernel_init=kaiming_out_init,
                dtype=self.dtype, name=name,
            )
        qkv = dense(3 * heads * head_dim, self.qkv_bias, "qkv")(x)
        # channel layout matches the torch conv output: (3, heads, head_dim)
        qkv = qkv.reshape(b, h * w, 3, heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # each (B, T, heads, d)

        # XLA's fused einsum chain beats the Pallas kernel at every shape in
        # this zoo (1.4-2.8x; tile padding at T<=100, hd<=85 — see
        # docs/KERNELS.md for the measured table), so False is the default.
        if self.use_pallas and not train and self.attn_drop == 0.0 and h * w >= 64:
            from ..kernels.attention import attention_core

            out = attention_core(q, k, v, scale, use_pallas=True)
        else:
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            attn = jax.nn.softmax(attn, axis=-1)
            # real attention capture (the reference's DEBUG attn_store,
            # visformer.py:12,187-188): a flax sow — dead code under normal
            # apply, materialized only when the caller passes
            # mutable=["intermediates"] (eval/visualize.py --real-attn)
            self.sow("intermediates", "attn", attn)
            attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(b, h, w, heads * head_dim)
        out = dense(self.dim, False, "proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class Block(nn.Module):
    """Pre-BN residual block: [attn] + conv-MLP (reference ``:243-265``)."""

    dim: int
    num_heads: int
    head_dim_ratio: float = 1.0
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    group: int = 8
    attn_disabled: bool = False
    spatial_conv: bool = False
    fold_bn: bool = False  # pre-norm BNs folded forward into qkv / mlp.conv1
    quant_int8: Any = False
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        dp = DropPath(self.drop_path, name="drop_path")
        if not self.attn_disabled:
            if self.fold_bn:
                y = x
            else:
                y = BatchNorm(dtype=self.dtype, name="norm1")(x, train)
            y = Attention(
                self.dim, self.num_heads, self.head_dim_ratio,
                self.qkv_bias or self.fold_bn,
                self.attn_drop, self.drop, use_pallas=self.use_pallas,
                quant_int8=self.quant_int8, dtype=self.dtype, name="attn",
            )(y, train)
            x = x + dp(y, deterministic=not train)
        if self.fold_bn:
            y = x
        else:
            y = BatchNorm(dtype=self.dtype, name="norm2")(x, train)
        y = Mlp(
            self.dim, self.mlp_ratio, self.group, self.spatial_conv,
            self.drop, first_bias=self.fold_bn, quant_int8=self.quant_int8,
            dtype=self.dtype, name="mlp",
        )(y, train)
        return x + dp(y, deterministic=not train)


class PatchEmbed(nn.Module):
    """Strided-conv patch embedding + optional BN (reference ``:268-290``).

    The reference only instantiates the norm when ``embedding_norm`` is passed
    (``norm_pe = norm_layer is not None``, ``:278-280``); the registered SUN
    variants pass BatchNorm, but ``net5``/``net5_80`` (``:490-499``) do not.
    """

    patch: int
    dim: int
    use_norm: bool = True
    quant_int8: Any = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.quant_int8:
            from .quant import QuantConv

            x = QuantConv(
                self.dim, (self.patch, self.patch),
                strides=(self.patch, self.patch), padding="VALID",
                use_bias=True, static_act=self.quant_int8 == "static",
                dtype=self.dtype, name="proj",
            )(x)
        else:
            x = nn.Conv(
                self.dim, (self.patch, self.patch),
                strides=(self.patch, self.patch), padding="VALID",
                kernel_init=kaiming_out_init, dtype=self.dtype, name="proj",
            )(x)
        if self.use_norm:
            x = BatchNorm(dtype=self.dtype, name="norm")(x, train)
        return x


class Visformer(nn.Module):
    """3-stage conv-attention hybrid; ``__call__ -> (dense NHWC, pooled)``."""

    img_size: int = 80
    init_channels: Optional[int] = 64
    embed_dim: int = 256
    depth: Sequence[int] = (4, 2, 3)
    num_heads: int = 6
    mlp_ratio: float = 4.0
    group: int = 8
    attn_stage: str = "011"
    spatial_conv: str = "100"
    qkv_bias: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    embed_norm: bool = True  # reference ``embedding_norm`` arg (None for net5)
    fold_bn: bool = False  # eval-only: frozen BNs pre-folded into conv/dense weights
    quant_int8: Any = False  # eval-only: False | True (dynamic) | "static" (needs fold_bn)
    use_pallas_attn: bool = False
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return self.embed_dim * 2

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        d1, d2, d3 = self.depth
        total = d1 + d2 + d3
        # stochastic-depth schedule: linspace(0, rate, total)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        pos_drop = nn.Dropout(self.drop_rate, deterministic=not train)

        def pos_embed(name: str, size: int, c: int) -> jax.Array:
            return self.param(name, trunc_normal_init(0.02), (1, size, size, c))

        def stage(x, prefix, n, first, dim, ratio, s_idx, train):
            attn_off = self.attn_stage[s_idx] == "0"
            sp_conv = self.spatial_conv[s_idx] == "1"
            for i in range(n):
                x = Block(
                    dim=dim, num_heads=self.num_heads, head_dim_ratio=ratio,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                    drop_path=dpr[first + i], group=self.group,
                    attn_disabled=attn_off, spatial_conv=sp_conv,
                    fold_bn=self.fold_bn, quant_int8=self.quant_int8,
                    use_pallas=self.use_pallas_attn,
                    dtype=self.dtype, name=f"{prefix}_{i}",
                )(x, train)
            return x

        if self.quant_int8 and not self.fold_bn:
            raise ValueError("quant_int8 requires fold_bn=True "
                             "(quantize FOLDED weights, models/quant.py)")
        # --- stage 1 (stride /4, dim D/2) ---
        if self.init_channels is not None:
            x = ConvStem(self.init_channels, self.embed_dim // 2,
                         fold_bn=self.fold_bn, quant_int8=self.quant_int8,
                         dtype=self.dtype, name="stem")(x, train)
            size = self.img_size // 4
        else:
            x = PatchEmbed(8, self.embed_dim // 2,
                           use_norm=self.embed_norm and not self.fold_bn,
                           quant_int8=self.quant_int8,
                           dtype=self.dtype, name="patch_embed1")(x, train)
            size = self.img_size // 8
        x = pos_drop(x + pos_embed("pos_embed1", size, self.embed_dim // 2))
        x = stage(x, "stage1", d1, 0, self.embed_dim // 2, 0.5, 0, train)

        # --- stage 2 (stride /8, dim D) ---
        x = PatchEmbed(2, self.embed_dim,
                       use_norm=self.embed_norm and not self.fold_bn,
                       quant_int8=self.quant_int8,
                       dtype=self.dtype, name="patch_embed2")(x, train)
        size //= 2
        x = pos_drop(x + pos_embed("pos_embed2", size, self.embed_dim))
        x = stage(x, "stage2", d2, d1, self.embed_dim, 1.0, 1, train)

        # --- stage 3 (stride /16, dim 2D) ---
        x = PatchEmbed(2, self.embed_dim * 2,
                       use_norm=self.embed_norm and not self.fold_bn,
                       quant_int8=self.quant_int8,
                       dtype=self.dtype, name="patch_embed3")(x, train)
        size //= 2
        x = pos_drop(x + pos_embed("pos_embed3", size, self.embed_dim * 2))
        x = stage(x, "stage3", d3, d1 + d2, self.embed_dim * 2, 1.0, 2, train)

        x = BatchNorm(dtype=self.dtype, name="norm")(x, train)
        return x, global_avg_pool(x)


@models.register("visformer_micro_80")
def visformer_micro_80(**kwargs: Any) -> Visformer:
    """Reference ``visformer_small_80`` registered as 'visformer_micro_80' (:484-489)."""
    return Visformer(
        img_size=80, init_channels=64, embed_dim=256, depth=(4, 2, 3),
        num_heads=6, mlp_ratio=4.0, group=8, attn_stage="011",
        spatial_conv="100", **kwargs,
    )


@models.register("visformer_tiny_80")
def visformer_tiny_80(**kwargs: Any) -> Visformer:
    return Visformer(
        img_size=80, init_channels=16, embed_dim=192, depth=(7, 4, 4),
        num_heads=3, mlp_ratio=4.0, group=8, attn_stage="011",
        spatial_conv="100", **kwargs,
    )


@models.register("visformer_small")
def visformer_small(**kwargs: Any) -> Visformer:
    return Visformer(
        img_size=224, init_channels=32, embed_dim=384, depth=(7, 4, 4),
        num_heads=6, mlp_ratio=4.0, group=8, attn_stage="011",
        spatial_conv="100", **kwargs,
    )


@models.register("net5_80")
def net5_80(**kwargs: Any) -> Visformer:
    return Visformer(
        img_size=80, init_channels=32, embed_dim=384, depth=(4, 4, 4),
        num_heads=6, mlp_ratio=4.0, group=1, attn_stage="111",
        spatial_conv="111", embed_norm=False, **kwargs,
    )
