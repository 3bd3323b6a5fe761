"""Memory-bounded HBM staging for datasets larger than device memory.

The epoch programs (``train/loop.py``) gather batches from a device-resident
uint8 image array — ideal while the split fits in HBM (mini/tiered/cifar),
impossible for ImageNet-800 scale (~24 GB vs 16 GB on a v5e). This module
keeps the dataset in host RAM (optionally an ``np.memmap``) and streams it
through HBM in fixed-size chunks per epoch:

  * one global permutation per epoch (same sample-once semantics as the
    reference's DataLoader shuffle, ``sun_meta_training/datasets/
    image_folder.py:12-67`` + drop_last);
  * the permutation is cut into equal chunks; each chunk's images are staged
    host->device as ONE transfer, then the unchanged jitted epoch program
    scans its steps with chunk-local indices;
  * every chunk has identical shapes, so the epoch program compiles exactly
    once (a second shape would cost minutes on slow-compile paths);
  * the permutation is padded by cycling to fill the last chunk — at most
    ``chunk_imgs - 1`` samples are revisited per epoch (the same class of
    rounding the reference's ``drop_last=True`` applies, in the other
    direction).

Batch composition is within-chunk; with a fresh global permutation per epoch
this is windowed shuffling (what streaming input pipelines do) and is
statistically equivalent for SGD at these chunk sizes.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional, Tuple

import numpy as np

DEFAULT_HBM_BUDGET_GB = 8.0


def needs_staging(images: np.ndarray, budget_gb: float = DEFAULT_HBM_BUDGET_GB) -> bool:
    return images.nbytes > budget_gb * (1 << 30)


class EpochStager:
    """Streams (images_dev, labels_dev, step_indices) chunks for one epoch.

    All chunks share one shape: ``chunk_steps * batch_size`` images staged,
    ``(chunk_steps, batch_size)`` chunk-local index matrix.
    """

    def __init__(
        self,
        images: np.ndarray,
        labels: np.ndarray,
        batch_size: int,
        budget_gb: float = DEFAULT_HBM_BUDGET_GB,
        sharding=None,
        image_sharding=None,
    ):
        self.images = images
        self.labels = np.asarray(labels, np.int32)
        self.batch_size = int(batch_size)
        self.sharding = sharding  # for the per-step index matrix (dp axis)
        self.image_sharding = image_sharding  # e.g. replicated over a mesh
        n = len(images)
        total_steps = n // self.batch_size
        if total_steps == 0:
            raise ValueError(f"dataset ({n}) smaller than batch size ({batch_size})")
        bytes_per_img = images.nbytes // n
        max_imgs = max(
            self.batch_size, int(budget_gb * (1 << 30)) // max(bytes_per_img, 1)
        )
        max_steps_per_chunk = max(1, max_imgs // self.batch_size)
        self.n_chunks = math.ceil(total_steps / max_steps_per_chunk)
        self.chunk_steps = math.ceil(total_steps / self.n_chunks)
        self.total_steps = total_steps

    @property
    def chunk_imgs(self) -> int:
        return self.chunk_steps * self.batch_size

    def epoch(
        self, rng: np.random.Generator
    ) -> Iterator[Tuple[object, object, object]]:
        """Yield ``(images_dev, labels_dev, idx)`` per chunk; ``idx`` is a
        chunk-local (chunk_steps, batch_size) int32 matrix."""
        import jax
        import jax.numpy as jnp

        n = len(self.images)
        perm = rng.permutation(n)
        need = self.n_chunks * self.chunk_imgs
        if need > n:
            perm = np.concatenate([perm, perm[: need - n]])
        perm = perm[:need]
        local_idx = jnp.asarray(
            np.arange(self.chunk_imgs, dtype=np.int32).reshape(
                self.chunk_steps, self.batch_size
            )
        )
        if self.sharding is not None:
            local_idx = jax.device_put(local_idx, self.sharding)
        for c in range(self.n_chunks):
            sel = perm[c * self.chunk_imgs : (c + 1) * self.chunk_imgs]
            # host gather (memmap-friendly: sorted access, then un-sort)
            order = np.argsort(sel, kind="stable")
            gathered = self.images[sel[order]]
            unsort = np.empty_like(order)
            unsort[order] = np.arange(len(order))
            imgs_host = gathered[unsort]
            if self.image_sharding is not None:
                imgs_dev = jax.device_put(imgs_host, self.image_sharding)
                labels_dev = jax.device_put(self.labels[sel], self.image_sharding)
            else:
                imgs_dev = jax.device_put(imgs_host)
                labels_dev = jax.device_put(self.labels[sel])
            # valid only for the duration of this yield: the buffer is freed
            # before the next chunk is staged so two chunks never coexist
            yield imgs_dev, labels_dev, local_idx
            imgs_dev.delete()


def epoch_subset(
    images: np.ndarray, idx: np.ndarray, cap: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Gather the unique images an epoch's episode indices touch, padded to a
    fixed ``cap`` rows (one compiled program across epochs), and remap ``idx``
    into the subset. For episodic tuning on over-HBM datasets (ImageNet-800):
    an epoch touches at most episodes*way*(shot+query) images, far below the
    split size."""
    uniq, inv = np.unique(idx, return_inverse=True)
    if len(uniq) > cap:
        raise ValueError(f"epoch touches {len(uniq)} unique images > cap {cap}")
    subset = np.asarray(images[uniq])
    if len(uniq) < cap:
        pad = np.broadcast_to(subset[:1], (cap - len(uniq),) + subset.shape[1:])
        subset = np.concatenate([subset, pad])
    return subset, inv.reshape(idx.shape).astype(np.int32)


def memmap_cache(path: str, images: Optional[np.ndarray] = None) -> np.ndarray:
    """Write-once / read-many uint8 memmap cache for huge image arrays.

    With ``images`` given: persist them at ``path`` (a ``.npy``) and return a
    read-only memmap view. Without: open an existing cache.
    """
    if images is not None:
        np.save(path, images)
    return np.load(path, mmap_mode="r")
