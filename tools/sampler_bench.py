"""Host-side episode-sampler cost check.

The sampler is the only per-episode host work left on the episodic training
path; this measures a full epoch of index draws at the reference's largest
episodic scale (VERDICT r2 #7). Run: ``python tools/sampler_bench.py``.
"""

import time

import numpy as np

from fewshot_vit_tpu.data.sampler import EpisodeSampler


def main():
    # miniImageNet train split: 64 classes x 600 images
    labels = np.repeat(np.arange(64), 600)
    for train_batches, way, n_per, epb in [
        (500, 10, 6, 8),   # SUN-M meta-tune scale (10-way 1+5, ep_per_batch 8)
        (500, 5, 16, 4),   # 5-way 1+15 eval-style draws
        (2000, 5, 16, 1),  # full eval protocol
    ]:
        s = EpisodeSampler(labels, train_batches, way, n_per, epb)
        rng = np.random.default_rng(0)
        t0 = time.perf_counter()
        n = sum(1 for _ in s.epoch(rng))
        dt = time.perf_counter() - t0
        print(
            f"train_batches={train_batches} way={way} n_per={n_per} epb={epb}: "
            f"{dt * 1e3:.1f} ms/epoch ({dt / n * 1e6:.0f} us/batch)"
        )


if __name__ == "__main__":
    main()
