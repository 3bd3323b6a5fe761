"""RNG plumbing.

The reference pins global seeds (torch/cuda/numpy, seed 12345 at
``sun_train_teacher/train_classifier.py:23-29`` and
``test_phase/test_few_shot.py:27-34``) and re-seeds numpy per epoch for
reproducible val episodes (``sun_meta_training/train_meta.py:147``). JAX is
functional: we thread explicit ``jax.random.key`` values. These helpers keep the
reference's *semantics* — one root seed, per-epoch derived episode streams —
without global state.
"""

from __future__ import annotations


import jax
import numpy as np

DEFAULT_SEED = 12345  # the reference's fixed seed


def enable_compilation_cache(path: str = "/root/.cache/jax_comp") -> None:
    """Persistent XLA compilation cache — first compiles on this box run
    20-600s (remote-compile TPU path), so cache across processes."""
    import os

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def root_key(seed: int = DEFAULT_SEED) -> jax.Array:
    return jax.random.key(seed)


def epoch_key(root: jax.Array, epoch: int) -> jax.Array:
    """Derived stream for one epoch (replaces ``np.random.seed(epoch)``)."""
    return jax.random.fold_in(root, epoch)


def step_keys(key: jax.Array, n: int) -> jax.Array:
    return jax.random.split(key, n)


def np_rng(seed: int = DEFAULT_SEED, epoch: int = 0) -> np.random.Generator:
    """Host-side generator for episode sampling / data order.

    The epoch goes into Philox's HIGH key word, not the counter: counter=e
    and counter=e+1 are the SAME stream offset by one 4-value block (near-
    total overlap between epochs), whereas distinct keys are Philox's
    designed independent-stream mechanism. key=[seed, 0] equals
    Philox(key=seed), so epoch-0 streams are unchanged."""
    return np.random.Generator(
        np.random.Philox(key=np.array([seed, epoch], dtype=np.uint64)))
