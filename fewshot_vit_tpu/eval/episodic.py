"""Episodic N-way K-shot evaluation engine.

Re-design of ``test_phase/test_few_shot.py:36-117``. The reference loops 2000
episodes through DataParallel, re-encoding 80 freshly-transformed images per
episode. Here the evaluator is built around the TPU's constraints (HBM is big,
host<->device links are slow, kernel launches are cheap only inside a program):

  * the **whole dataset lives in HBM** as uint8 (miniImageNet test split is
    ~230 MB); episodes are device-side gathers by index;
  * episode *indices* are sampled on host (numpy RNG, reproducing the reference
    sampler semantics) and shipped once — a few hundred KB for 2000 episodes;
  * the full eval is ONE jit program: ``lax.scan`` over episode batches, each
    iteration gathering, normalizing, encoding and scoring a fixed-shape batch;
    a single host fetch returns all per-episode accuracies;
  * **cached-features mode**: the eval transform is deterministic, so each
    image's embedding is identical across episodes — encode the test set once,
    then episodes are gathers + cosine logits over features. Mathematically
    identical accuracy, another ~80x less compute.

Reports mean accuracy with a 95% Student-t confidence interval, exactly as
``test_few_shot.py:20-25``.
"""

from __future__ import annotations

import collections
import math
from typing import Optional, Tuple

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


def sample_episode_indices(
    dataset: ArrayDataset,
    n_episodes: int,
    way: int,
    n_per: int,
    ep_per_batch: int,
    seed: int,
) -> np.ndarray:
    """(n_batches, ep_per_batch*way*n_per) int32 episode indices (host-side)."""
    n_batches = math.ceil(n_episodes / ep_per_batch)
    sampler = EpisodeSampler(dataset.labels, n_batches, way, n_per, ep_per_batch)
    rng = rng_mod.np_rng(seed)
    return np.stack(list(sampler.epoch(rng))).astype(np.int32)


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
    images_dev: Optional[jax.Array] = None,
    mesh=None,
    indices: Optional[np.ndarray] = None,
) -> Tuple[float, float, np.ndarray]:
    """Full-protocol eval (re-encode every episode). Returns (acc, ci95, accs).

    Pass ``images_dev`` (device-resident ``dataset.images``) to amortize the
    one-time upload across calls. Pass ``mesh`` (a `jax.sharding.Mesh` with a
    ``data`` axis) to shard the per-batch image axis across chips — episode
    parallelism over ICI, variables and the dataset replicated.
    ``indices`` overrides episode sampling with an explicit
    ``(n_batches, ep_per_batch*way*(shot+query))`` index matrix (e.g. episodes
    drawn by the reference sampler for protocol-parity checks).
    """
    if indices is not None:
        idx_all = np.asarray(indices, np.int32)
    else:
        idx_all = sample_episode_indices(
            dataset, n_episodes, way, shot + query, ep_per_batch, seed
        )
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        variables = jax.device_put(variables, NamedSharding(mesh, P()))
        # honor a caller-supplied device-resident copy: replicating it is a
        # device-to-device transfer, re-uploading dataset.images is a slow
        # host->device one per call
        images_dev = jax.device_put(
            dataset.images if images_dev is None else images_dev,
            NamedSharding(mesh, P()))
        idx_all = jax.device_put(
            jnp.asarray(idx_all), NamedSharding(mesh, P(None, "data"))
        )
    if images_dev is None:
        images_dev = jax.device_put(dataset.images)
    run = _eval_run_fn(head_model, way, shot, query, ep_per_batch,
                       tuple(np.asarray(dataset.mean).tolist()),
                       tuple(np.asarray(dataset.std).tolist()))
    accs = np.asarray(run(variables, images_dev, jnp.asarray(idx_all)))[:n_episodes]
    m, h = mean_confidence_interval(accs)
    return m, h, accs


# jitted-callable cache: a fresh closure per call would force a full recompile
# on every invocation (training loops call evaluate() each epoch — on this
# box's remote-compile path that is ~a minute of wasted wall per epoch).
# Bounded LRU: entries hold strong refs to models AND compiled executables,
# so an unbounded dict would pin every head a sweep script ever evaluates.
_EVAL_RUN_CACHE: "collections.OrderedDict[tuple, tuple]" = collections.OrderedDict()
_EVAL_RUN_CACHE_MAX = 8


def _cache_get(key):
    hit = _EVAL_RUN_CACHE.get(key)
    if hit is not None:
        _EVAL_RUN_CACHE.move_to_end(key)
    return hit


def _cache_put(key, val):
    _EVAL_RUN_CACHE[key] = val
    _EVAL_RUN_CACHE.move_to_end(key)
    while len(_EVAL_RUN_CACHE) > _EVAL_RUN_CACHE_MAX:
        _EVAL_RUN_CACHE.popitem(last=False)


def _eval_run_fn(head_model, way, shot, query, ep_per_batch, mean, std):
    key = (id(head_model), way, shot, query, ep_per_batch, mean, std)
    hit = _cache_get(key)
    if hit is not None and hit[0] is head_model:
        return hit[1]
    labels = make_nk_label(way, query, ep_per_batch)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)

    @jax.jit
    def run(variables, images, idx_all):
        def body(carry, idx):
            x = normalize(images[idx], mean_a, std_a)
            xs, xq = split_shot_query(x, way, shot, query, ep_per_batch)
            logits = head_model.apply(variables, xs, xq, train=False)
            return carry, per_episode_acc(logits, labels)

        _, accs = jax.lax.scan(body, None, idx_all)
        return accs.reshape(-1)

    _cache_put(key, (head_model, run))
    return run


# --- cached-features fast path ------------------------------------------------


def encode_dataset(
    encoder,
    variables,
    dataset: ArrayDataset,
    batch_size: int = 1024,
    images_dev: Optional[jax.Array] = None,
) -> jax.Array:
    """Embed every image once -> pooled features (N, C), device-resident."""
    n = len(dataset)
    if images_dev is None:
        images_dev = jax.device_put(dataset.images)
    run = _encode_run_fn(encoder, n, batch_size,
                         tuple(np.asarray(dataset.mean).tolist()),
                         tuple(np.asarray(dataset.std).tolist()))
    return run(variables, images_dev)


def _encode_run_fn(encoder, n, batch_size, mean, std):
    key = (id(encoder), n, batch_size, mean, std)
    hit = _cache_get(key)
    if hit is not None and hit[0] is encoder:
        return hit[1]
    n_batches = math.ceil(n / batch_size)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)

    @jax.jit
    def run(variables, images):
        def body(carry, start):
            idx = start + jnp.arange(batch_size)
            x = normalize(images[jnp.minimum(idx, n - 1)], mean_a, std_a)
            _, pooled = encoder.apply(variables, x, train=False)
            return carry, pooled

        starts = jnp.arange(n_batches) * batch_size
        _, feats = jax.lax.scan(body, None, starts)
        return feats.reshape(n_batches * batch_size, -1)[:n]

    _cache_put(key, (encoder, run))
    return run


def _cached_run_fn(way, shot, query, ep_per_batch, temp):
    key = ("cached", way, shot, query, ep_per_batch, temp)
    hit = _cache_get(key)
    if hit is not None:
        return hit[1]
    labels = make_nk_label(way, query, ep_per_batch)

    @jax.jit
    def run(feats, idx_all):
        def body(carry, idx):
            f = feats[idx]  # (E, way, shot+query, C)
            proto = f[:, :, :shot].mean(axis=2)
            f_query = f[:, :, shot:].reshape(ep_per_batch, way * query, -1)
            logits = compute_logits(f_query, proto, metric="cos", temp=temp)
            return carry, per_episode_acc(logits, labels)

        _, accs = jax.lax.scan(body, None, idx_all)
        return accs.reshape(-1)

    _cache_put(key, (None, run))
    return run


def evaluate_cached(
    encoder,
    encoder_variables,
    dataset: ArrayDataset,
    n_episodes: int = 2000,
    way: int = 5,
    shot: int = 1,
    query: int = 15,
    ep_per_batch: int = 8,
    temp: float = 10.0,
    seed: int = rng_mod.DEFAULT_SEED,
    feats: Optional[jax.Array] = None,
) -> Tuple[float, float, np.ndarray]:
    """Cached-features eval for cosine/meta-baseline heads. Same math as
    ``evaluate`` (deterministic encoder), episodes are index gathers."""
    if feats is None:
        feats = encode_dataset(encoder, encoder_variables, dataset)
    idx_all = sample_episode_indices(
        dataset, n_episodes, way, shot + query, ep_per_batch, seed
    )
    idx_all = idx_all.reshape(-1, ep_per_batch, way, shot + query)
    run = _cached_run_fn(way, shot, query, ep_per_batch, float(temp))
    accs = np.asarray(run(feats, jnp.asarray(idx_all)))[:n_episodes]
    m, h = mean_confidence_interval(accs)
    return m, h, accs
