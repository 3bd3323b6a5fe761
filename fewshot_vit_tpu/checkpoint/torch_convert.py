"""PyTorch checkpoint -> flax variable conversion.

Needed to load the reference's released ``.pth`` checkpoints (format documented
at SURVEY.md §2.1: dict with ``model``, ``model_args``, ``model_sd``; save block
``sun_train_teacher/train_classifier.py:247-274``) and reproduce the published
67.8/83.3 miniImageNet numbers on TPU.

Strategy: walk the *flax* variable tree (the target), derive each leaf's torch
state-dict key from the module path via per-architecture rules, and transpose
layouts (torch OIHW conv -> flax HWIO; torch 1x1-conv -> flax Dense (I, O);
torch NCHW pos-embed -> NHWC). Every torch tensor must be consumed exactly once
(except ``num_batches_tracked``) or conversion fails loudly.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Tuple

import numpy as np

# --- layout transposes ----------------------------------------------------

def conv_t2j(w: np.ndarray) -> np.ndarray:
    """torch conv (O, I/g, kh, kw) -> flax (kh, kw, I/g, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def dense_from_1x1(w: np.ndarray) -> np.ndarray:
    """torch 1x1 conv (O, I, 1, 1) -> flax Dense kernel (I, O)."""
    assert w.ndim == 4 and w.shape[2] == w.shape[3] == 1, w.shape
    return np.transpose(w[:, :, 0, 0], (1, 0))


def dense_t2j(w: np.ndarray) -> np.ndarray:
    """torch Linear (O, I) -> flax Dense kernel (I, O)."""
    return np.transpose(w, (1, 0))


def pos_embed_t2j(w: np.ndarray) -> np.ndarray:
    """torch (1, C, H, W) -> flax (1, H, W, C)."""
    return np.transpose(w, (0, 2, 3, 1))


# --- generic tree walk ------------------------------------------------------

def _flatten(tree: Mapping[str, Any], prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Any]:
    out: Dict[Tuple[str, ...], Any] = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for path, v in flat.items():
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return out


def convert_by_rule(
    flax_vars: Mapping[str, Any],
    torch_sd: Mapping[str, np.ndarray],
    key_fn: Callable[[Tuple[str, ...], Tuple[str, ...]], str],
) -> Dict[str, Any]:
    """Fill a flax variable tree ({'params':..., 'batch_stats':...}) from a
    torch state dict. ``key_fn(collection_path, leaf_path) -> torch key``.

    Values are transposed based on the flax leaf name and the shapes involved.
    Raises on any unconsumed torch tensor or shape mismatch.
    """
    sd = {k: np.asarray(v) for k, v in torch_sd.items()}
    used = set()
    new_flat: Dict[Tuple[str, ...], Any] = {}

    for col, tree in flax_vars.items():
        for path, leaf in _flatten(tree).items():
            tkey = key_fn((col,), path)
            if tkey not in sd:
                raise KeyError(f"torch key {tkey!r} (for flax {col}/{'/'.join(path)}) not in state dict")
            w = sd[tkey]
            used.add(tkey)
            name = path[-1]
            target_shape = np.shape(leaf)
            if name == "kernel":
                if w.ndim == 4 and len(target_shape) == 4:
                    w = conv_t2j(w)
                elif w.ndim == 4 and len(target_shape) == 2:
                    w = dense_from_1x1(w)
                elif w.ndim == 2 and len(target_shape) == 2:
                    w = dense_t2j(w)
                else:
                    raise ValueError(f"kernel rank mismatch at {path}: torch {w.shape} -> flax {target_shape}")
            elif (name.startswith("pos_embed") and w.ndim == 4
                  and tuple(w.shape) != tuple(target_shape)):
                # 2-D positional maps are NCHW in torch -> NHWC; token-major
                # pos embeds (ViT (1,N,D), NesT (1,T,N,C)) already match
                w = pos_embed_t2j(w)
            if tuple(w.shape) != tuple(target_shape):
                raise ValueError(f"shape mismatch at {col}/{'/'.join(path)}: torch {w.shape} vs flax {target_shape}")
            new_flat[(col,) + path] = w.astype(np.asarray(leaf).dtype)

    # non-learned buffers, plus 'adapool.weight': a dead reference parameter —
    # its gating use is commented out of the forward it belongs to
    # (meta_tuning_sun_m/swin_3conv_adapool.py:347-357)
    _buffers = ("num_batches_tracked", "relative_position_index", "attn_mask",
                "attention_bias_idxs", "adapool.weight")
    leftover = {k for k in sd if k not in used and not k.endswith(_buffers)}
    if leftover:
        raise ValueError(f"unconsumed torch tensors: {sorted(leftover)[:10]} (+{max(0, len(leftover)-10)} more)")

    nested = _unflatten(new_flat)
    return {col: nested[col] for col in flax_vars}


# --- per-architecture key rules ---------------------------------------------

_BN_LEAF = {"scale": "weight", "bias": "bias", "mean": "running_mean", "var": "running_var"}


def visformer_key(col: Tuple[str, ...], path: Tuple[str, ...], prefix: str = "") -> str:
    """Flax path -> torch key for the Visformer family.

    Examples:
      params/stem/conv1/kernel           -> stem.conv1.weight
      params/stem/downsample_bn/scale    -> stem.downsample.1.weight
      params/stage2_0/attn/qkv/kernel    -> stage2.0.attn.qkv.weight
      params/stage1_3/norm2/bn/scale     -> stage1.3.norm2.bn.weight
      batch_stats/norm/bn/mean           -> norm.bn.running_mean
      params/pos_embed1                  -> pos_embed1
    """
    parts = list(path)
    leaf = parts.pop()
    if not parts and leaf.startswith("pos_embed"):
        return prefix + leaf
    torch_parts = []
    for p in parts:
        if p.startswith("stage") and "_" in p:
            s, i = p.split("_")
            torch_parts += [s, i]
        elif p == "downsample_conv":
            torch_parts += ["downsample", "0"]
        elif p == "downsample_bn":
            torch_parts += ["downsample", "1"]
        else:
            torch_parts.append(p)
    if leaf in _BN_LEAF and (parts[-1].startswith("bn") or parts[-1] == "bn"
                             or parts[-1].startswith("downsample_bn")):
        leaf = _BN_LEAF[leaf]
    elif leaf == "kernel":
        leaf = "weight"
    return prefix + ".".join(torch_parts + [leaf])


def resnet_key(col: Tuple[str, ...], path: Tuple[str, ...], prefix: str = "") -> str:
    """ResNet-18/50: flax ``layer2_1/conv1`` -> torch ``layer2.1.conv1``;
    ResNet-12: flax ``layer1/conv1`` -> torch ``layer1.conv1``;
    downsample pairs map to Sequential indices."""
    parts = list(path)
    leaf = parts.pop()
    torch_parts = []
    for p in parts:
        if p.startswith("layer") and "_" in p:
            s, i = p.split("_")
            torch_parts += [s, i]
        elif p == "downsample_conv":
            torch_parts += ["downsample", "0"]
        elif p == "downsample_bn":
            torch_parts += ["downsample", "1"]
        else:
            torch_parts.append(p)
    if leaf in _BN_LEAF and (parts[-1].startswith("bn") or parts[-1].startswith("downsample_bn")):
        leaf = _BN_LEAF[leaf]
    elif leaf == "kernel":
        leaf = "weight"
    return prefix + ".".join(torch_parts + [leaf])


def resnet12_drop_key(col: Tuple[str, ...], path: Tuple[str, ...], prefix: str = "") -> str:
    """resnet12-drop: blocks live in single-element Sequentials —
    flax ``layer1/conv1`` -> torch ``layer1.0.conv1``; the block's
    num_batches_tracked counter maps through (``resnet_drop.py:153-176``)."""
    parts = list(path)
    leaf = parts.pop()
    torch_parts = []
    for p in parts:
        if p.startswith("layer"):
            torch_parts += [p, "0"]
        elif p == "downsample_conv":
            torch_parts += ["downsample", "0"]
        elif p == "downsample_bn":
            torch_parts += ["downsample", "1"]
        else:
            torch_parts.append(p)
    if leaf in _BN_LEAF and parts and (
        parts[-1].startswith("bn") or parts[-1].startswith("downsample_bn")
    ):
        leaf = _BN_LEAF[leaf]
    elif leaf == "kernel":
        leaf = "weight"
    return prefix + ".".join(torch_parts + [leaf])


def convnet4_key(col: Tuple[str, ...], path: Tuple[str, ...], prefix: str = "") -> str:
    """ConvNet4: flax ``conv{i}``/``bn{i}`` -> torch ``encoder.{i}.0/.1``."""
    parts = list(path)
    leaf = parts.pop()
    name = parts[0]
    i = name[-1]
    if name.startswith("conv"):
        return f"{prefix}encoder.{i}.0.{'weight' if leaf == 'kernel' else leaf}"
    return f"{prefix}encoder.{i}.1.{_BN_LEAF.get(leaf, leaf)}"


def deit_key(col: Tuple[str, ...], path: Tuple[str, ...], prefix: str = "") -> str:
    """DeiT/ViT: flax ``blocks_3/attn/qkv`` -> torch ``blocks.3.attn.qkv``;
    ``mlp_fc1`` -> ``mlp.fc1``; ``patch_embed`` -> ``patch_embed.proj``;
    LayerNorm scale -> weight."""
    parts = list(path)
    leaf = parts.pop()
    if parts == [] and leaf in ("cls_token", "pos_embed"):
        return prefix + leaf
    torch_parts = []
    for p in parts:
        if p.startswith("blocks_"):
            torch_parts += ["blocks", p.split("_")[1]]
        elif p == "patch_embed":
            torch_parts += ["patch_embed", "proj"]
        elif p.startswith("mlp_fc"):
            torch_parts += ["mlp", p.split("_")[1]]
        else:
            torch_parts.append(p)
    leaf = {"kernel": "weight", "scale": "weight"}.get(leaf, leaf)
    return prefix + ".".join(torch_parts + [leaf])


def nest_key(col: Tuple[str, ...], path: Tuple[str, ...], prefix: str = "") -> str:
    """NesT: flax ``levels_1_layers_0/attn/qkv`` ->
    torch ``levels.1.transformer_encoder.0.attn.qkv``; ``levels_0_pos_embed``
    (top-level param) -> ``levels.0.pos_embed``; ``levels_1_pool/conv`` ->
    ``levels.1.pool.conv``; resembed conv-stem children map like visformer's."""
    parts = list(path)
    leaf = parts.pop()
    if not parts and leaf.startswith("levels_") and leaf.endswith("pos_embed"):
        i = leaf.split("_")[1]
        return f"{prefix}levels.{i}.pos_embed"
    torch_parts = []
    for p in parts:
        if p.startswith("levels_") and "_layers_" in p:
            _, i, _, j = p.split("_")
            torch_parts += ["levels", i, "transformer_encoder", j]
        elif p.startswith("levels_") and p.endswith("_pool"):
            torch_parts += ["levels", p.split("_")[1], "pool"]
        elif p.startswith("mlp_fc"):
            torch_parts += ["mlp", p.split("_")[1]]
        elif p == "downsample_conv":
            torch_parts += ["downsample", "0"]
        elif p == "downsample_bn":
            torch_parts += ["downsample", "1"]
        else:
            torch_parts.append(p)
    if leaf in ("mean", "var") or (
        leaf in ("scale", "bias") and parts and
        (parts[-1].startswith("bn") or parts[-1] == "downsample_bn")
    ):
        leaf = _BN_LEAF[leaf]
    else:
        leaf = {"kernel": "weight", "scale": "weight"}.get(leaf, leaf)
    # plain 4x4 patch embed is a bare conv in flax but PatchEmbed.proj in torch
    if torch_parts == ["patch_embed"] and not any(
        c in path for c in ("conv1", "conv2", "conv3")
    ):
        torch_parts = ["patch_embed", "proj"]
    return prefix + ".".join(torch_parts + [leaf])


def swin_key(col: Tuple[str, ...], path: Tuple[str, ...], prefix: str = "") -> str:
    """Swin: flax ``layers_0_blocks_1/attn/qkv`` -> torch
    ``layers.0.blocks.1.attn.qkv``; ``layers_0_downsample/reduction`` ->
    ``layers.0.downsample.reduction``; ``patch_embed_proj``/``patch_embed_norm``
    -> ``patch_embed.proj``/``.norm``; 3conv stem children map like visformer."""
    parts = list(path)
    leaf = parts.pop()
    if not parts and leaf == "absolute_pos_embed":
        return prefix + leaf
    torch_parts = []
    for p in parts:
        if p.startswith("layers_") and "_blocks_" in p:
            _, i, _, j = p.split("_")
            torch_parts += ["layers", i, "blocks", j]
        elif p.startswith("layers_") and p.endswith("_downsample"):
            torch_parts += ["layers", p.split("_")[1], "downsample"]
        elif p == "patch_embed_proj":
            torch_parts += ["patch_embed", "proj"]
        elif p == "patch_embed_norm":
            torch_parts += ["patch_embed", "norm"]
        elif p.startswith("mlp_fc"):
            torch_parts += ["mlp", p.split("_")[1]]
        elif p == "downsample_conv":
            torch_parts += ["downsample", "0"]
        elif p == "downsample_bn":
            torch_parts += ["downsample", "1"]
        else:
            torch_parts.append(p)
    if leaf in ("mean", "var") or (
        leaf in ("scale", "bias") and parts
        and (parts[-1].startswith("bn") or parts[-1] == "downsample_bn")
    ):
        leaf = _BN_LEAF[leaf]
    else:
        leaf = {"kernel": "weight", "scale": "weight"}.get(leaf, leaf)
    return prefix + ".".join(torch_parts + [leaf])


def levit_key(col: Tuple[str, ...], path: Tuple[str, ...], prefix: str = "") -> str:
    """LeViT: Residual-wrapped blocks nest under ``.m``; MLP LinearNorms are
    Sequential indices 0/2; subsample q is Sequential index 1; attention/mlp
    proj sits at Sequential index 1 after the activation.

      blocks_0/qkv/c/kernel        -> blocks.0.m.qkv.c.weight
      blocks_0/proj/c/kernel       -> blocks.0.m.proj.1.c.weight
      blocks_0/attention_biases    -> blocks.0.m.attention_biases
      blocks_1/fc1/bn/scale        -> blocks.1.m.0.bn.weight
      blocks_2_sub/kv/c/kernel     -> blocks.2.kv.c.weight
      blocks_2_sub/q/c/kernel      -> blocks.2.q.1.c.weight
    """
    parts = list(path)
    leaf = parts.pop()
    is_sub = bool(parts) and parts[0].endswith("_sub")
    torch_parts = []
    for j, p in enumerate(parts):
        if p.startswith("blocks_"):
            i = p.split("_")[1]
            torch_parts += ["blocks", i] if is_sub else ["blocks", i, "m"]
        elif p == "fc1":
            torch_parts.append("0")
        elif p == "fc2":
            torch_parts.append("2")
        elif p == "proj":
            torch_parts += ["proj", "1"]
        elif p == "q":
            torch_parts += ["q", "1"]
        elif p == "downsample_conv":
            torch_parts += ["downsample", "0"]
        elif p == "downsample_bn":
            torch_parts += ["downsample", "1"]
        else:
            torch_parts.append(p)
    if leaf == "attention_biases":
        return prefix + ".".join(torch_parts + [leaf])
    if leaf in _BN_LEAF and parts and (parts[-1] == "bn" or parts[-1].startswith("bn")
                                       or parts[-1] == "downsample_bn"):
        leaf = _BN_LEAF[leaf]
    elif leaf == "kernel":
        leaf = "weight"
    return prefix + ".".join(torch_parts + [leaf])


# encoder registry name -> torch key rule (for head checkpoint ingestion)
ENCODER_KEY_FNS: Dict[str, Callable] = {}
for _n in ("visformer_micro_80", "visformer_tiny_80", "visformer_small", "net5_80"):
    ENCODER_KEY_FNS[_n] = visformer_key
for _n in ("resnet12", "resnet12-wide", "resnet18", "resnet50"):
    ENCODER_KEY_FNS[_n] = resnet_key
ENCODER_KEY_FNS["convnet4"] = convnet4_key
for _n in ("nest_nano_80", "nest_micro_80", "nest_micro_resembed_80",
           "nest_micro_resembed_2x_80", "nest_12m_v3",
           # research variants share the NesT layout (tests/test_variants.py
           # converts them with nest_key)
           "nest_micro_v2_gpsa", "nest_micro_v2_rel_80",
           "nest_micro_resembed_ada_80"):
    ENCODER_KEY_FNS[_n] = nest_key
for _n in ("swin_nano_patch4_window5_80", "swin_micro_resembed_80",
           "swin_micro_v2_resembed_ada_80"):
    ENCODER_KEY_FNS[_n] = swin_key
ENCODER_KEY_FNS["resnet12-drop"] = resnet12_drop_key
ENCODER_KEY_FNS["levit_micro_80"] = levit_key


def lvvit_key(col, path, prefix=""):
    """LV-ViT: like deit_key but the conv-stem patch_embed children pass
    through (patch_embed.conv1 / .proj), with BN leaf handling."""
    parts = list(path)
    leaf = parts.pop()
    if not parts and leaf in ("cls_token", "pos_embed"):
        return prefix + leaf
    torch_parts = []
    for p in parts:
        if p.startswith("blocks_"):
            torch_parts += ["blocks", p.split("_")[1]]
        elif p.startswith("mlp_fc"):
            torch_parts += ["mlp", p.split("_")[1]]
        elif p == "downsample_conv":
            torch_parts += ["downsample", "0"]
        elif p == "downsample_bn":
            torch_parts += ["downsample", "1"]
        else:
            torch_parts.append(p)
    if leaf in ("mean", "var") or (
        leaf in ("scale", "bias") and parts
        and (parts[-1].startswith("bn") or parts[-1] == "downsample_bn")
    ):
        leaf = _BN_LEAF[leaf]
    else:
        leaf = {"kernel": "weight", "scale": "weight"}.get(leaf, leaf)
    return prefix + ".".join(torch_parts + [leaf])


ENCODER_KEY_FNS["lvvit_micro_80"] = lvvit_key
for _n in ("deit_tiny_patch16_224", "deit_small_patch16_224", "deit_base_patch16_224",
           "deit_nano_patch16_224", "deit_nano_patch6_84", "deit_micro_patch6_84"):
    ENCODER_KEY_FNS[_n] = deit_key


def convert_visformer(flax_vars: Mapping[str, Any], torch_sd: Mapping[str, np.ndarray],
                      prefix: str = "") -> Dict[str, Any]:
    """Convert a reference Visformer state dict. ``prefix`` strips e.g. 'encoder.'."""
    return convert_by_rule(
        flax_vars, torch_sd, lambda col, path: visformer_key(col, path, prefix)
    )


def strip_prefix(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Select + strip a key prefix (reference nests encoders as 'encoder.*',
    tolerating 'module.' DataParallel wrappers — ``Models/utils.py:76-99``)."""
    out = {}
    for k, v in sd.items():
        k2 = k[len("module."):] if k.startswith("module.") else k
        if k2.startswith(prefix):
            out[k2[len(prefix):]] = v
    return out
