"""int8-quantized eval forward (experimental, opt-in).

Motivation: with bf16 at the measured layout ceiling (docs/KERNELS.md
stage-1/stage-2 falsification tables), the MXU's int8 path is the one
remaining precision lever — ``tools/int8_probe.py`` measured a uniform
1.5-1.6x int8-over-bf16 at every eval-path op shape, *including* the
grouped conv whose 32-wide tiles cap bf16 MFU. This module wires it:

  * **weights**: per-output-channel symmetric int8, quantized ONCE on host
    from the FOLDED eval weights (``models/fold.py`` — BNs must be folded
    first so their affines are inside the quantization grid);
  * **activations**: dynamic per-tensor symmetric int8 (scale = max|x|/127
    computed in-graph — no calibration data needed; symmetric quant maps 0
    to 0, so conv zero-padding stays exact);
  * **accumulation**: int32 on the MXU, dequantized with the combined
    activation x per-channel weight scale; softmax, pooling, residuals and
    the final output BN stay in the compute dtype.

The reference has no quantization story at all; this is TPU-native
headroom, not parity. Accuracy is gated by synthetic-protocol tests
(``tests/test_quant.py``); REAL-data accuracy cannot be validated on this
box (no released checkpoints/datasets), so the wiring is opt-in
(``eval.run --int8``, ``bench.py --int8``) and labeled experimental.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def dynamic_quant(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """bf16/f32 tensor -> (int8 tensor, f32 scalar scale). Symmetric, so
    0 maps to 0 exactly (conv padding stays exact)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_kernel(k: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """f32 kernel (..., out) -> (int8 kernel, f32 per-out-channel scale)."""
    k = np.asarray(k, np.float64)
    axes = tuple(range(k.ndim - 1))
    ws = np.maximum(np.abs(k).max(axis=axes) / 127.0, 1e-12)
    q = np.clip(np.round(k / ws), -127, 127).astype(np.int8)
    return q, ws.astype(np.float32)


def _act_quant(mod: nn.Module, x: jax.Array,
               static_act: bool) -> Tuple[jax.Array, jax.Array]:
    """Quantize the activation: dynamic (in-graph max, sown for
    calibration) or static (calibrated 'ascale' param — no in-graph
    reduction/sync point per layer)."""
    if static_act:
        s = mod.param("ascale", nn.initializers.ones, (), jnp.float32)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                     -127, 127).astype(jnp.int8)
        return q, s
    q, s = dynamic_quant(x)
    mod.sow("intermediates", "ascale", s)  # calibration capture
    return q, s


class QuantDense(nn.Module):
    """int8 Dense: per-channel weight scales, int32 MXU accumulation;
    activation quant dynamic or static (calibrated)."""

    features: int
    use_bias: bool = False
    static_act: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.param("kernel", nn.initializers.zeros,
                       (x.shape[-1], self.features), jnp.int8)
        ws = self.param("wscale", nn.initializers.ones,
                        (self.features,), jnp.float32)
        q, s = _act_quant(self, x, self.static_act)
        y = jax.lax.dot_general(
            q, k, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (s * ws)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
        return y.astype(self.dtype)


class QuantConv(nn.Module):
    """int8 conv (NHWC/HWIO): per-channel weight scales, int32 MXU
    accumulation; activation quant dynamic or static (calibrated)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    feature_group_count: int = 1
    use_bias: bool = False
    static_act: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        cin = x.shape[-1] // self.feature_group_count
        k = self.param("kernel", nn.initializers.zeros,
                       (kh, kw, cin, self.features), jnp.int8)
        ws = self.param("wscale", nn.initializers.ones,
                        (self.features,), jnp.float32)
        q, s = _act_quant(self, x, self.static_act)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        dn = jax.lax.conv_dimension_numbers(
            q.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            q, k, tuple(self.strides), pad, dimension_numbers=dn,
            feature_group_count=self.feature_group_count,
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (s * ws)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
        return y.astype(self.dtype)


def quantize_tree(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize every {kernel[, bias]} leaf-dict of a FOLDED params tree;
    everything else (pos embeds, the final output norm) passes through."""
    out: Dict[str, Any] = {}
    for name, sub in params.items():
        if isinstance(sub, dict) and "kernel" in sub:
            qk, ws = quantize_kernel(sub["kernel"])
            d = {"kernel": qk, "wscale": ws}
            if "bias" in sub:
                d["bias"] = np.asarray(sub["bias"], np.float32)
            out[name] = d
        elif isinstance(sub, dict):
            out[name] = quantize_tree(sub)
        else:
            out[name] = sub
    return out


def quantize_visformer(folded_vars: Dict[str, Any]) -> Dict[str, Any]:
    """FOLDED visformer variables -> variables for the same architecture
    constructed with ``fold_bn=True, quant_int8=True``."""
    out = {"params": quantize_tree(folded_vars["params"])}
    if "batch_stats" in folded_vars:  # the final output norm's stats
        out["batch_stats"] = folded_vars["batch_stats"]
    return out


def _insert_ascales(params: Dict[str, Any], scales: Dict[str, Any]) -> None:
    """Write calibrated 'ascale' leaves (sown intermediates tree) into the
    quantized params tree, in place."""
    for name, sub in scales.items():
        if name == "ascale":
            params["ascale"] = np.asarray(sub[0], np.float32)
        elif isinstance(sub, dict):
            _insert_ascales(params.setdefault(name, {}), sub)


def quantize_encoder_in_head(head, variables: Dict[str, Any],
                             calib_images=None):
    """Fold + quantize the ``encoder`` submodule of a head. Returns
    ``(quantized_head, quantized_variables)``; raises NotImplementedError
    for encoder families without a registered folder (folding is the
    prerequisite) or without int8 support.

    With ``calib_images`` (a normalized model-input batch), activation
    scales are CALIBRATED on that batch and baked as static 'ascale'
    params — the eval graph then has no per-layer max reductions
    (``quant_int8="static"``). Without it, scales are dynamic in-graph."""
    from .fold import fold_encoder_in_head

    folded_head, folded_vars = fold_encoder_in_head(head, variables)
    enc = folded_head.encoder
    if not hasattr(enc, "quant_int8"):
        raise NotImplementedError(
            f"encoder {type(enc).__name__} has no int8 path")
    enc_vars = {
        col: tree["encoder"] for col, tree in folded_vars.items()
        if "encoder" in tree
    }
    q_enc = quantize_visformer(enc_vars)
    mode: Any = True
    if calib_images is not None:
        dyn_enc = enc.clone(quant_int8=True)
        _, state = dyn_enc.apply(
            q_enc, jnp.asarray(calib_images), train=False,
            mutable=["intermediates"])
        _insert_ascales(q_enc["params"], state["intermediates"])
        mode = "static"
    new_vars: Dict[str, Any] = {}
    for col, tree in folded_vars.items():
        rest = {k: v for k, v in tree.items() if k != "encoder"}
        if col in q_enc:
            rest["encoder"] = q_enc[col]
        if rest:
            new_vars[col] = rest
    return folded_head.clone(encoder=enc.clone(quant_int8=mode)), new_vars
