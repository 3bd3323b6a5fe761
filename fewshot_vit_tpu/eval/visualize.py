"""Attention-map visualization.

Re-design of ``fewshot_vit_vis_attn_template.py:86-109``: synthesize a
cls-token attention map from the encoder's dense features — mean-pooled
pseudo-cls token split into 16 pseudo-heads, scaled dot-product softmax over
patch tokens, head-averaged — then min-max normalize, square for contrast,
upsample to the image size, JET-colormap and alpha-blend (0.7 img / 0.3 map)
onto the denormalized image, written as JPGs.

Run: ``python -m fewshot_vit_tpu.eval.visualize --config configs/test_mini_1shot.yaml --out vis/ --n 16``

``--real-attn`` instead captures the TRUE post-softmax attention from the
live forward (every zoo attention module sows its weights — the reference's
``DEBUG``/``attn_store`` hook, ``visformer.py:12,187-188``) and overlays the
deepest block's head+query-averaged map.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core import load_config
from ..core import rng as rng_mod
from ..data.transforms import denormalize, normalize


def attention_maps(dense: jax.Array, num_heads: int = 16) -> jax.Array:
    """Dense features (B, H, W, C) -> attention maps (B, H, W) in [0, 1]."""
    b, h, w, c = dense.shape
    hd = c // num_heads
    tokens = dense.reshape(b, h * w, num_heads, hd)
    cls = tokens.mean(axis=1, keepdims=True)  # (B, 1, heads, hd)
    attn = jnp.einsum("bqhd,bkhd->bhqk", cls, tokens) / (hd ** 0.5)
    attn = jax.nn.softmax(attn, axis=-1)
    amap = attn.mean(axis=(1, 2)).reshape(b, h, w)  # mean over heads + query
    lo = amap.min(axis=(1, 2), keepdims=True)
    hi = amap.max(axis=(1, 2), keepdims=True)
    return (amap - lo) / jnp.maximum(hi - lo, 1e-8)


def real_attention_maps(encoder, enc_vars, x: jax.Array) -> jax.Array:
    """TRUE attention maps (B, H, W) in [0, 1] from a live forward.

    The reference capability this matches is visformer's ``DEBUG=True``
    ``attn_store`` hook (``sun_meta_training/models/visformer.py:12,187-188``)
    — here every zoo attention module ``sow``s its post-softmax weights, so
    one apply with ``mutable=["intermediates"]`` captures them all. The map is
    the deepest attention block's weights averaged over heads and query
    tokens (global attention (B, h, T, T) reshaped to the token grid; NesT's
    blocked attention (B, T, h, N, N) deblockified back to the image plane).
    """
    import re

    from ..models.nest import deblockify

    _, state = encoder.apply(
        enc_vars, x, train=False, mutable=["intermediates"])

    found = []  # (path_string, key, array) in depth order

    def natkey(path):
        # 'stage3_10' must sort after 'stage3_2': split digit runs to ints
        return tuple(
            tuple(int(s) if s.isdigit() else s for s in re.split(r"(\d+)", seg))
            for seg in path
        )

    def walk(tree, path):
        for k in sorted(tree, key=lambda s: natkey((s,))):
            v = tree[k]
            if isinstance(v, dict):
                walk(v, path + (k,))
            elif k in ("attn", "attn_map") and isinstance(v, tuple):
                found.append(("/".join(path), k, v[0]))

    walk(state["intermediates"], ())
    if not found:
        raise ValueError(
            f"{type(encoder).__name__} sowed no attention — capture is wired "
            "for visformer / nest / swin families")
    # deepest attention block; prefer its image-plane 'attn_map' sow (swin
    # windows are stitched + unshifted by the module itself) over raw weights
    deepest = found[-1][0]
    at_deepest = {k: v for p, k, v in found if p == deepest}
    if "attn_map" in at_deepest:
        amap = at_deepest["attn_map"]  # (B, H', W'), ready
    else:
        attn = at_deepest["attn"]
        if attn.ndim == 4:  # (B, heads, q, k) over the flattened token grid
            if attn.shape[0] != x.shape[0]:
                raise ValueError(
                    f"attention batch {attn.shape[0]} != image batch "
                    f"{x.shape[0]} and no 'attn_map' sown — windowed "
                    "attention without image-plane geometry")
            amap = attn.mean(axis=(1, 2))  # (B, T)
            g = int(np.sqrt(amap.shape[-1]))
            amap = amap.reshape(amap.shape[0], g, g)
        elif attn.ndim == 5:  # NesT blocked: (B, T, heads, N, N)
            amap = attn.mean(axis=(2, 3))  # (B, T, N)
            n = amap.shape[-1]
            bs = int(np.sqrt(n))
            amap = deblockify(amap[..., None], bs)[..., 0]  # (B, H', W')
        else:
            raise ValueError(f"unexpected attention rank {attn.ndim}")
    lo = amap.min(axis=(1, 2), keepdims=True)
    hi = amap.max(axis=(1, 2), keepdims=True)
    return (amap - lo) / jnp.maximum(hi - lo, 1e-8)


_JET = None


def _jet(x: np.ndarray) -> np.ndarray:
    """OpenCV-style JET colormap for x in [0,1] -> uint8 RGB."""
    v = np.clip(x, 0, 1) * 4.0
    r = np.clip(np.minimum(v - 1.5, -v + 4.5), 0, 1)
    g = np.clip(np.minimum(v - 0.5, -v + 3.5), 0, 1)
    b = np.clip(np.minimum(v + 0.5, -v + 2.5), 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def overlay(image_norm: np.ndarray, amap: np.ndarray,
            mean=None, std=None, img_weight: float = 0.7) -> np.ndarray:
    """Blend a JET-colored attention map over a normalized image -> uint8 RGB."""
    from PIL import Image

    img = np.asarray(denormalize(jnp.asarray(image_norm),
                                 *( (mean, std) if mean is not None else ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)) )))
    img = np.clip(img * 255.0, 0, 255)
    h, w = img.shape[:2]
    am = np.asarray(Image.fromarray((amap * 255).astype(np.uint8)).resize((w, h), Image.BILINEAR), np.float32) / 255.0
    am = am ** 2  # contrast, as the reference
    heat = _jet(am)
    return (img * img_weight + heat * (1 - img_weight)).astype(np.uint8)


def main():
    p = argparse.ArgumentParser(description="attention visualization")
    p.add_argument("--config", required=True)
    p.add_argument("--out", default="./vis")
    p.add_argument("--n", type=int, default=16)
    p.add_argument("--real-attn", action="store_true",
                   help="overlay TRUE post-softmax attention captured from "
                        "the live forward (the reference's attn_store) "
                        "instead of the template's feature-synthesized maps")
    args = p.parse_args()
    rng_mod.enable_compilation_cache()
    cfg = load_config(args.config)

    from ..core.registry import datasets as dataset_registry
    from .. import models as _models  # noqa: F401
    from .. import heads as _heads  # noqa: F401
    from ..data import datasets as _datasets  # noqa: F401
    from .run import load_model_for_eval
    from PIL import Image

    ds = dataset_registry.make(cfg.get("dataset", "mini-imagenet"),
                               **dict(cfg.get("dataset_args", {}) or {}))
    head, variables = load_model_for_eval(cfg)
    from .episodic import sub_variables

    enc_vars = sub_variables(variables, "encoder")

    os.makedirs(args.out, exist_ok=True)
    imgs = jnp.asarray(ds.images[: args.n])
    x = normalize(imgs, ds.mean, ds.std)
    if args.real_attn:
        maps = np.asarray(real_attention_maps(head.encoder, enc_vars, x))
    else:
        dense, _ = head.encoder.apply(enc_vars, x, train=False)
        maps = np.asarray(attention_maps(dense))
    x_np = np.asarray(x)
    for i in range(args.n):
        out = overlay(x_np[i], maps[i], ds.mean, ds.std)
        Image.fromarray(out).save(os.path.join(args.out, f"{i}.jpg"))
    print(f"wrote {args.n} overlays to {args.out}")


if __name__ == "__main__":
    main()
