"""Frozen-BN folding: rewrite eval-time weights so BatchNorms disappear.

The reference ships this idea for LeViT only (``sun_meta_training/models/
levit.py:150-172`` ``ConvNorm.fuse`` / ``LinearNorm.fuse``); here it is a
framework-level weight transform for the whole eval path. In eval mode every
BatchNorm is the fixed per-channel affine

    y = x * m + t,  m = scale / sqrt(var + eps),  t = bias - mean * m

which folds *exactly* into an adjacent matmul:

  * BN **after** a conv/dense (post-norm, e.g. the visformer stem and patch
    embeds):  kernel' = kernel * m  (per OUT channel),  bias' = bias * m + t;
  * BN **before** a dense (pre-norm, e.g. the visformer block norms feeding
    qkv / mlp.conv1):  kernel' = m[:, None] * kernel  (per IN channel),
    bias' = bias + t @ kernel.

XLA cannot do this itself: the weights arrive as runtime arguments, so the
compiler sees BN as two elementwise ops per call site, not as constants. The
transform runs once on host at load time; the folded module (``fold_bn=True``
on the encoder) then traces without any BN between matmuls.

Use :func:`fold_visformer` / :func:`fold_levit` on an encoder's variables, or
:func:`fold_encoder_in_head` on a whole head (e.g. MetaBaseline) whose
``encoder`` submodule supports ``fold_bn`` (dispatched by family). Exactness
(not approximation) is asserted by ``tests/test_fold.py`` against the
unfolded forward; the user-facing wiring is ``eval.run --fold-bn`` and the
bench default.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

BN_EPS = 1e-5  # torch BatchNorm2d default, used across the zoo


def _affine(bn_params: Dict[str, Any], bn_stats: Dict[str, Any]) -> Tuple[np.ndarray, np.ndarray]:
    """(m, t) of the eval-mode BN affine y = x*m + t."""
    scale = np.asarray(bn_params["scale"], np.float64)
    bias = np.asarray(bn_params["bias"], np.float64)
    mean = np.asarray(bn_stats["mean"], np.float64)
    var = np.asarray(bn_stats["var"], np.float64)
    m = scale / np.sqrt(var + BN_EPS)
    return m, bias - mean * m


def _fold_after(layer: Dict[str, Any], m: np.ndarray, t: np.ndarray) -> Dict[str, Any]:
    """Fold BN(conv(x)) / BN(dense(x)): scale the OUT axis (last)."""
    k = np.asarray(layer["kernel"], np.float64)
    b = np.asarray(layer.get("bias", np.zeros(k.shape[-1])), np.float64)
    return {
        "kernel": (k * m).astype(np.float32),
        "bias": (b * m + t).astype(np.float32),
    }


def _fold_before(layer: Dict[str, Any], m: np.ndarray, t: np.ndarray) -> Dict[str, Any]:
    """Fold dense(BN(x)): scale the IN axis (first of a (in, out) kernel)."""
    k = np.asarray(layer["kernel"], np.float64)
    b = np.asarray(layer.get("bias", np.zeros(k.shape[-1])), np.float64)
    return {
        "kernel": (m[:, None] * k).astype(np.float32),
        "bias": (b + t @ k).astype(np.float32),
    }


def _fold_convstem(sub: Dict[str, Any], stats: Dict[str, Any]) -> Dict[str, Any]:
    """Fold the residual 3-conv stem's four conv+BN pairs (ConvStem)."""
    d: Dict[str, Any] = {}
    for conv, bn in (
        ("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3"),
        ("downsample_conv", "downsample_bn"),
    ):
        m, t = _affine(sub[bn], stats[bn])
        d[conv] = _fold_after(sub[conv], m, t)
    return d


def fold_visformer(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Fold every foldable BN of a Visformer's variables.

    Input: unfolded ``{"params", "batch_stats"}`` (``fold_bn=False`` tree).
    Output: variables for the SAME architecture constructed with
    ``fold_bn=True``. Folded sites: the 4 stem conv+BN pairs, the patch-embed
    conv+BN pairs, and every block's pre-norm BN (forward into ``attn.qkv`` /
    ``mlp.conv1``). The final ``norm`` BN is the model output and has no
    adjacent matmul — it stays, so ``batch_stats`` keeps exactly that entry.
    """
    P, S = variables["params"], variables["batch_stats"]
    newp: Dict[str, Any] = {}
    news: Dict[str, Any] = {}
    for name, sub in P.items():
        if name == "norm":
            newp[name] = sub
            news[name] = S[name]
        elif name == "stem":
            newp[name] = _fold_convstem(sub, S[name])
        elif name.startswith("patch_embed"):
            if "norm" in sub:
                m, t = _affine(sub["norm"]["bn"], S[name]["norm"]["bn"])
                newp[name] = {"proj": _fold_after(sub["proj"], m, t)}
            else:  # net5-style embed_norm=False
                newp[name] = sub
        elif name.startswith("stage"):
            d = {k: v for k, v in sub.items() if k not in ("norm1", "norm2")}
            if "norm1" in sub:
                m, t = _affine(sub["norm1"]["bn"], S[name]["norm1"]["bn"])
                attn = dict(sub["attn"])
                attn["qkv"] = _fold_before(attn["qkv"], m, t)
                d["attn"] = attn
            m, t = _affine(sub["norm2"]["bn"], S[name]["norm2"]["bn"])
            mlp = dict(sub["mlp"])
            mlp["conv1"] = _fold_before(mlp["conv1"], m, t)
            d["mlp"] = mlp
            newp[name] = d
        else:  # pos_embed*, anything BN-free
            newp[name] = sub
    return {"params": newp, "batch_stats": news}


def fold_levit(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Fold every BN of a LeViT's variables — the framework-level version of
    the reference's own ``ConvNorm.fuse`` / ``LinearNorm.fuse``
    (``sun_meta_training/models/levit.py:150-196``).

    LeViT is fully post-norm: the ConvStem patch embed folds like the
    visformer stem, and every ``LinearNorm`` ({'c': Dense, 'bn': BN}) folds
    its BN backward into a biased Dense. No BN survives, so the returned
    variables carry no ``batch_stats`` collection at all (matching a
    ``fold_bn=True`` init)."""
    P, S = variables["params"], variables["batch_stats"]

    def walk(p: Dict[str, Any], s: Dict[str, Any]) -> Dict[str, Any]:
        if "c" in p and "bn" in p:  # a LinearNorm
            m, t = _affine(p["bn"], s["bn"])
            return {"c": _fold_after(p["c"], m, t)}
        out: Dict[str, Any] = {}
        for k, v in p.items():
            if isinstance(v, dict):
                out[k] = walk(v, s.get(k, {}) if isinstance(s, dict) else {})
            else:
                out[k] = v  # attention_biases and other bare params
        return out

    newp: Dict[str, Any] = {}
    for name, sub in P.items():
        if name == "patch_embed":
            newp[name] = _fold_convstem(sub, S[name])
        elif isinstance(sub, dict):
            newp[name] = walk(sub, S.get(name, {}))
        else:
            newp[name] = sub
    return {"params": newp}


def fold_resnet12(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Fold a ResNet-12's variables: every residual block is exactly the
    ConvStem pattern (conv1-3 + 1x1 shortcut, each with a post-BN), so all
    BNs fold backward into biased convs and no ``batch_stats`` survive."""
    P, S = variables["params"], variables["batch_stats"]
    return {"params": {name: _fold_convstem(sub, S[name])
                       for name, sub in P.items()}}


_FOLDERS = {
    "Visformer": fold_visformer,
    "Levit": fold_levit,
    "ResNet12": fold_resnet12,
}


def fold_encoder_in_head(head, variables: Dict[str, Any]):
    """Fold the ``encoder`` submodule of a head (e.g. MetaBaseline).

    Returns ``(folded_head, folded_variables)`` where ``folded_head`` is the
    head rebuilt with ``encoder.fold_bn=True`` and ``folded_variables`` has the
    encoder subtree transformed (other head params — temp, classifier —
    untouched). Raises for encoder families without a folder registered.
    """
    enc = head.encoder
    folder = _FOLDERS.get(type(enc).__name__)
    if folder is None:
        raise NotImplementedError(
            f"no BN folder for encoder {type(enc).__name__}; "
            f"supported: {sorted(_FOLDERS)}"
        )
    enc_vars = {
        col: tree["encoder"] for col, tree in variables.items() if "encoder" in tree
    }
    folded_enc = folder(enc_vars)
    new_vars: Dict[str, Any] = {}
    for col, tree in variables.items():
        rest = {k: v for k, v in tree.items() if k != "encoder"}
        if col in folded_enc:
            rest["encoder"] = folded_enc[col]
        if rest:
            new_vars[col] = rest
    new_head = head.clone(encoder=enc.clone(fold_bn=True))
    return new_head, new_vars
