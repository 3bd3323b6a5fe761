"""Episodic N-way K-shot evaluation engine.

Re-design of ``test_phase/test_few_shot.py:36-117``: instead of a Python loop
re-encoding every episode through DataParallel, the evaluator

  * jit-compiles ONE fixed-shape program per (way, shot, query, ep_per_batch)
    — episodes ride a leading batch axis, uint8 images are normalized on
    device, and the whole head (encode -> prototypes -> logits -> accuracy)
    fuses into a single XLA computation;
  * optionally runs in **cached-features mode**: the eval transform is
    deterministic, so each image's embedding is identical across the 2000
    episodes — encode the test set once, then episodes are pure gathers +
    cosine logits. Mathematically identical accuracy, orders of magnitude
    more episodes/sec (the reference re-encodes 80 images x 2000 episodes).

Reports mean accuracy with a 95% Student-t confidence interval, exactly as
``test_few_shot.py:20-25``.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng as rng_mod
from ..data.datasets import ArrayDataset
from ..data.sampler import EpisodeSampler
from ..ops.episodes import make_nk_label, split_shot_query
from ..ops.metric import compute_logits, mean_confidence_interval, per_episode_acc
from ..data.transforms import normalize


def sub_variables(variables, name: str):
    """Slice a submodule's variables out of a parent's, across ALL collections
    (params, batch_stats, ...). E.g. encoder vars from a head's vars."""
    return {col: tree[name] for col, tree in variables.items() if name in tree}


def make_episode_eval_fn(
    head_model,
    way: int,
    shot: int,
    query: int,
    ep_per_batch: int,
    mean: np.ndarray,
    std: np.ndarray,
) -> Callable:
    """jitted: (variables, uint8 images (E*way*(s+q), H, W, 3)) -> per-episode acc (E,)."""

    labels = make_nk_label(way, query, ep_per_batch)

    @jax.jit
    def eval_batch(variables, images_u8):
        x = normalize(images_u8, mean, std)
        xs, xq = split_shot_query(x, way, shot, query, ep_per_batch)
        logits = head_model.apply(variables, xs, xq, train=False)
        return per_episode_acc(logits, labels)

    return eval_batch


def evaluate(
    head_model,
    variables,
    dataset: ArrayDataset,
    n_episodes: int = 2000,
    way: int = 5,
    shot: int = 1,
    query: int = 15,
    ep_per_batch: int = 8,
    seed: int = rng_mod.DEFAULT_SEED,
) -> Tuple[float, float, np.ndarray]:
    """Full-protocol eval (re-encode every episode). Returns (acc, ci95, per-episode accs)."""
    n_batches = math.ceil(n_episodes / ep_per_batch)
    sampler = EpisodeSampler(
        dataset.labels, n_batches, way, shot + query, ep_per_batch
    )
    rng = rng_mod.np_rng(seed)
    fn = make_episode_eval_fn(
        head_model, way, shot, query, ep_per_batch, dataset.mean, dataset.std
    )
    accs = []
    for idx in sampler.epoch(rng):
        imgs = jnp.asarray(dataset.images[idx])
        accs.append(np.asarray(fn(variables, imgs)))
    accs = np.concatenate(accs)[:n_episodes]
    m, h = mean_confidence_interval(accs)
    return m, h, accs


# --- cached-features fast path ------------------------------------------------


def encode_dataset(
    encoder,
    variables,
    dataset: ArrayDataset,
    batch_size: int = 256,
) -> jax.Array:
    """Embed every image once -> pooled features (N, C) on device."""

    @jax.jit
    def embed(variables, images_u8):
        x = normalize(images_u8, dataset.mean, dataset.std)
        _, pooled = encoder.apply(variables, x, train=False)
        return pooled

    n = len(dataset)
    pad = (-n) % batch_size
    images = dataset.images
    if pad:
        images = np.concatenate([images, np.zeros((pad,) + images.shape[1:], np.uint8)])
    feats = [
        embed(variables, jnp.asarray(images[i : i + batch_size]))
        for i in range(0, len(images), batch_size)
    ]
    return jnp.concatenate(feats)[:n]


def make_cached_eval_fn(
    way: int, shot: int, query: int, temp: float = 10.0
) -> Callable:
    """jitted: (feats (N,C), idx (E, way, shot+query)) -> per-episode acc (E,)."""

    @jax.jit
    def eval_idx(feats, idx):
        ep = idx.shape[0]
        f = feats[idx]  # (E, way, shot+query, C)
        f_shot = f[:, :, :shot]
        f_query = f[:, :, shot:].reshape(ep, way * query, -1)
        proto = f_shot.mean(axis=2)
        logits = compute_logits(f_query, proto, metric="cos", temp=temp)
        labels = make_nk_label(way, query, ep)
        return per_episode_acc(logits, labels)

    return eval_idx


def evaluate_cached(
    encoder,
    encoder_variables,
    dataset: ArrayDataset,
    n_episodes: int = 2000,
    way: int = 5,
    shot: int = 1,
    query: int = 15,
    ep_per_batch: int = 200,
    temp: float = 10.0,
    seed: int = rng_mod.DEFAULT_SEED,
    feats: Optional[jax.Array] = None,
) -> Tuple[float, float, np.ndarray]:
    """Cached-features eval for cosine/meta-baseline heads. Same math as
    ``evaluate`` (deterministic encoder), episodes are index gathers."""
    if feats is None:
        feats = encode_dataset(encoder, encoder_variables, dataset)
    n_batches = math.ceil(n_episodes / ep_per_batch)
    sampler = EpisodeSampler(dataset.labels, n_batches, way, shot + query, ep_per_batch)
    rng = rng_mod.np_rng(seed)
    fn = make_cached_eval_fn(way, shot, query, temp)
    accs = []
    for idx in sampler.epoch(rng):
        idx = jnp.asarray(idx.reshape(ep_per_batch, way, shot + query))
        accs.append(np.asarray(fn(feats, idx)))
    accs = np.concatenate(accs)[:n_episodes]
    m, h = mean_confidence_interval(accs)
    return m, h, accs
