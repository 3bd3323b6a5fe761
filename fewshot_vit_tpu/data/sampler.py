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
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence

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

    def batch(self, rng: np.random.Generator) -> np.ndarray:
        """One flat index batch, shape (ep_per_batch * n_way * n_per,)."""
        eps = np.empty((self.ep_per_batch, self.n_way, self.n_per), np.int64)
        for e in range(self.ep_per_batch):
            classes = rng.choice(len(self.catlocs), self.n_way, replace=False)
            for i, c in enumerate(classes):
                eps[e, i] = rng.choice(self.catlocs[c], self.n_per, replace=False)
        return eps.reshape(-1)

    def epoch(self, rng: np.random.Generator) -> Iterator[np.ndarray]:
        for _ in range(self.n_batch):
            yield self.batch(rng)
