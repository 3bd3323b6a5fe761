"""Shared SUN-D (DeepEMD) evaluation programs.

Used by both the standalone eval CLI (``eval/run_emd.py``) and the training
loop's per-epoch validation + inline final test (``train/meta_tune_emd.py``),
so the protocol exists exactly once.

Two execution strategies over the same episode math:

* direct — ``train.meta_tune_emd.make_emd_episode_fn`` re-encodes the
  episode's images (the reference's work per episode,
  ``meta_tuning_sun_d/eval.py``);
* cached — for DETERMINISTIC eval patch pipelines (grid with fixed
  ``patch_ratio``, fcn) an image's node features are a fixed function of the
  image, so ``make_emd_node_cache_fn`` encodes each image once and
  ``make_emd_cached_episode_fn`` gathers nodes per episode — identical
  logits (frozen-BN eval forward), encoder work O(dataset) instead of
  O(episodes x way*(shot+query)). ``sampling`` draws random crops per
  episode and is not cacheable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_emd_node_cache_fn(head, patch_fn, mean, std, batch: int = 128):
    """jit: (variables, images u8 (N, H, W, 3)) -> node features (N, Nn, C).

    Encodes every image ONCE through the (deterministic) eval patch pipeline;
    valid for grid/fcn where eval patches are a fixed function of the image."""
    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)

    @jax.jit
    def encode_all(variables, images):
        n = images.shape[0]
        n_batches = -(-n // batch)
        starts = jnp.arange(n_batches) * batch

        def body(carry, start):
            idx = jnp.minimum(start + jnp.arange(batch), n - 1)
            x = patch_fn(images[idx], jax.random.key(0))
            x = (x / 255.0 - mean_a) / std_a
            nodes = head.apply(variables, x, False, method=head.encode_nodes)
            return carry, nodes

        _, nodes = jax.lax.scan(body, None, starts)
        return nodes.reshape((-1,) + nodes.shape[2:])[:n]

    return encode_all


def make_emd_cached_episode_fn(head, way: int, shot: int, sfc: bool, sfc_kw=None):
    """(variables, ep_nodes (way*(shot+query), Nn, C), rng) -> logits.

    The cached twin of ``train.meta_tune_emd.make_emd_episode_fn`` (same
    interleaved layout, shot-mean prototypes, SFC for shot>1, EMD matching) —
    minus the encoder, which already ran in ``make_emd_node_cache_fn``."""
    from ..heads.deepemd import sfc_refine

    sfc_kw = dict(sfc_kw or {})

    def fn(variables, ep_nodes, rng):
        # same rng split as make_emd_episode_fn (k1 fed the patch pipeline
        # there; k2 drives SFC) so cached == uncached bit-for-bit in the SFC
        # mini-batch shuffles too
        _, k2 = jax.random.split(rng)
        k = way * shot
        shot_nodes = ep_nodes[:k].reshape(shot, way, *ep_nodes.shape[1:])
        proto = shot_nodes.mean(axis=0)
        query_nodes = ep_nodes[k:]
        if sfc and shot > 1:
            proto = sfc_refine(proto, ep_nodes[:k], way, shot, k2, **sfc_kw)
        return head.apply(variables, proto, query_nodes, method=head.meta)

    return fn


def make_emd_eval_run_fn(episode_fn, labels):
    """One jitted eval program shared by the direct and cached paths:
    ``(variables, data, idx (n_batches, epb, ep_len), rng) -> accs (flat)``.

    Scans episode batches; within a batch the episodes are vmapped, so the
    encoder sees ``ep_per_batch`` episodes of patches at once. The per-episode
    rng is folded by GLOBAL episode index, so accuracies are identical for
    any ``ep_per_batch`` grouping."""

    v_fn = jax.vmap(episode_fn, in_axes=(None, 0, 0))

    @jax.jit
    def run(variables, data, idx, rng):
        epb = idx.shape[1]

        def body(carry, scan_in):
            idx_b, b = scan_in
            keys = jax.vmap(jax.random.fold_in, (None, 0))(
                rng, b * epb + jnp.arange(epb))
            logits = v_fn(variables, data[idx_b], keys)  # (epb, w*q, way)
            acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32),
                           axis=-1)
            return carry, acc

        _, accs = jax.lax.scan(body, None, (idx, jnp.arange(idx.shape[0])))
        return accs.reshape(-1)

    return run


def group_episode_indices(idx, ep_per_batch: int):
    """(n_episodes, ep_len) int32 -> (n_batches, epb, ep_len), padding by
    repeating the last episode (truncate accs to n_episodes after the run)."""
    import numpy as np

    idx = np.asarray(idx, np.int32)
    n_pad = (-idx.shape[0]) % ep_per_batch
    if n_pad:
        idx = np.concatenate([idx, np.repeat(idx[-1:], n_pad, axis=0)])
    return idx.reshape(-1, ep_per_batch, idx.shape[-1])
