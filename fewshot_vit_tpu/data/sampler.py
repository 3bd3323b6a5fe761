"""Episodic index sampling (host side, pure numpy).

Re-design of the reference ``CategoriesSampler``
(``sun_meta_training/datasets/samplers.py:5-35``): per batch, for each of
``ep_per_batch`` episodes draw ``n_way`` classes without replacement, then
``n_per = shot+query`` items per class without replacement; emit a flat index
array in episode-major, class-major, item-minor order (the order
``ops.episodes.split_shot_query`` expects).

Unlike the reference (implicit global ``np.random`` state), sampling is driven
by an explicit ``np.random.Generator`` so per-epoch reproducibility
(``train_meta.py:147`` re-seeding) is just ``rng_for_epoch(seed, epoch)``.

The draw is fully vectorized (one batch = 2 ``rng.random`` calls + two
``argpartition``s, no per-episode Python loop): uniform-without-replacement
sampling is "score with iid uniforms, keep the k smallest" — the kept subset
is uniform and its order exchangeable — applied per episode for the class
draw and per (episode, way) row (padded to the longest class with +inf
scores) for the item draw. This keeps the host off the critical path at
large ``train_batches`` (see ``tools/sampler_bench.py``).
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np


class EpisodeSampler:
    def __init__(
        self,
        labels: Sequence[int],
        n_batch: int,
        n_way: int,
        n_per: int,
        ep_per_batch: int = 1,
    ):
        self.n_batch = n_batch
        self.n_way = n_way
        self.n_per = n_per
        self.ep_per_batch = ep_per_batch
        labels = np.asarray(labels)
        self.catlocs: List[np.ndarray] = [
            np.argwhere(labels == c).reshape(-1) for c in range(int(labels.max()) + 1)
        ]
        n_classes = len(self.catlocs)
        if n_way > n_classes:
            raise ValueError(f"n_way={n_way} > {n_classes} classes")
        for c, locs in enumerate(self.catlocs):
            if len(locs) < n_per:
                raise ValueError(f"class {c} has {len(locs)} < n_per={n_per} items")
        # dense (C, Lmax) class->items matrix, padded rows never selected
        # because their scores are forced to +inf in batch()
        self._cat_len = np.array([len(l) for l in self.catlocs])
        lmax = int(self._cat_len.max())
        self._cat_mat = np.zeros((n_classes, lmax), np.int64)
        for c, locs in enumerate(self.catlocs):
            self._cat_mat[c, : len(locs)] = locs

    def batch(self, rng: np.random.Generator) -> np.ndarray:
        """One flat index batch, shape (ep_per_batch * n_way * n_per,)."""
        e, w, p = self.ep_per_batch, self.n_way, self.n_per
        n_classes, lmax = self._cat_mat.shape
        # classes: the n_way smallest of E rows of iid uniforms = a uniform
        # n_way-subset per episode (argpartition order is exchangeable)
        classes = np.argpartition(
            rng.random((e, n_classes), dtype=np.float32), w - 1, axis=1
        )[:, :w]  # (E, W)
        # items: per (episode, class) row, score all Lmax slots, mask the
        # padding to +inf, keep the n_per smallest -> uniform w/o replacement
        scores = rng.random((e, w, lmax), dtype=np.float32)
        valid = np.arange(lmax) < self._cat_len[classes][..., None]  # (E, W, Lmax)
        scores = np.where(valid, scores, np.inf)
        item_slots = np.argpartition(scores, p - 1, axis=-1)[..., :p]  # (E, W, P)
        eps = np.take_along_axis(self._cat_mat[classes], item_slots, axis=-1)
        return eps.reshape(-1)

    def epoch(self, rng: np.random.Generator) -> Iterator[np.ndarray]:
        for _ in range(self.n_batch):
            yield self.batch(rng)
